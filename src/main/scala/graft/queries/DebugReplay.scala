package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation: dump the LP inputs/outputs at every planning
  * point of the n02 replay (run at sf0.01) — evidence for the live-oracle
  * derivation that planM is constant. Not part of the catalog.
  */
object DebugReplay {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cs = ControlQueries.chunkScores(spark, d)
      .as[(Long, Long, Double, Double, Double)]
      .collect().groupBy(_._1).toSeq.sortBy(_._1)

    for ((sid, rows) <- cs) {
      val sorted = rows.sortBy(_._2)
      val sw = ControlQueries.mkSwitcher()
      var curScore = 0.0; var first = true; var nPlan = 0
      for (r <- sorted) {
        if (first) { first = false; curScore = r._3 }
        else {
          val snapBefore = sw.snapshot
          val willPlan = snapBefore.counter % 500 == 0
          if (willPlan) {
            val hist = snapBefore.categoryCounter
            nPlan += 1
            val (cfg, _, _, _) = sw.switch(curScore)
            val planM = sw.snapshot.planM.get
            println(s"stream=$sid plan#$nPlan counter=${snapBefore.counter} hist=${hist.mkString(",")} planM=${planM.map(_.mkString("[", " ", "]")).mkString}")
            curScore = (if (cfg == 0) r._3 else if (cfg == 1) r._4 else r._5)
          } else {
            val (cfg, _, _, _) = sw.switch(curScore)
            curScore = (if (cfg == 0) r._3 else if (cfg == 1) r._4 else r._5)
          }
        }
      }
      println(s"stream=$sid chunks=${sorted.length} plans=$nPlan")
    }
    spark.stop()
  }
}
