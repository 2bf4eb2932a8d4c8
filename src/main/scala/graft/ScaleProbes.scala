package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiments that need more than a wall-clock number — prints
  * the INTERNAL quantities SCALING.md's mechanism notes cite (candidate
  * volumes, cell-size distributions), so the "sub-quadratic" claims are
  * measured, not modeled.
  *
  * Usage: runMain graft.ScaleProbes <probe> <sfDir> [args...]
  *   semdedup <sfDir> <maxCell>  — semDedup cell stats + wall at the cap
  *                                 (maxCell 0 = uncapped)
  */
object ScaleProbes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.toList match {
      case "semdedup" :: sfDir :: maxCell :: Nil =>
        val emb = Tables.embeddings(spark, sfDir)
        val t0 = System.nanoTime()
        val out = graft.operators.Similarity
          .semDedup(emb, threshold = 0.3, maxCell = maxCell.toInt)
          .localCheckpoint(true)
        val n = out.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // candidate volume = Sigma |cell|^2 over the REFINED cells —
        // the quantity the pair join actually scans
        val stats = out.groupBy("cell").agg(count(lit(1)).as("m"))
          .agg(count(lit(1)).as("cells"), max("m").as("max_cell"),
            sum(expr("m * m")).as("pair_volume"))
          .collect().head
        val dups = out.filter(!col("keep")).count()
        println(f"""[probe] {"probe":"semdedup","sf":"$sfDir","maxCell":$maxCell,""" +
          f""""n":$n,"cells":${stats.getLong(0)},"max_cell":${stats.getLong(1)},""" +
          f""""pair_volume":${stats.getLong(2)},"dropped":$dups,"wall_sec":$wall%.2f}""")
      case other =>
        System.err.println(s"unknown probe args: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
