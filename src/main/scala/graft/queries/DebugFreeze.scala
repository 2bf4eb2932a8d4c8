package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: print the deterministic trained constants as
  * full-precision DuckDB literals for the frozen-constant live oracles
  * (e05/n07 spark.ml centroids, n05 ledger, n09/n10 MLP weights). Not
  * in the catalog. The PQBOOKS/SEM sections remain as cross-check aids
  * only — since r14 the e08/e10 oracles replay those Lloyd fits LIVE
  * in SQL and freeze nothing.
  */
object DebugFreeze {
  private def lit1(a: Array[Double]): String =
    a.map(java.lang.Double.toString).mkString("[", ", ", "]")
  private def lit2(a: Array[Array[Double]]): String =
    a.map(lit1).mkString("[", ",\n ", "]")
  private def lit3(a: Array[Array[Array[Double]]]): String =
    a.map(lit2).mkString("[", ",\n\n", "]")

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    println("=== PQBOOKS (8 x 16 x 8) ===")
    println(lit3(Similarity.pqCodebooks(emb)))

    println("=== KM10 (10 x 64, spark.ml seed 42 maxIter 10) ===")
    val feats = emb.select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(10).setSeed(42).setMaxIter(10).fit(feats)
    println(lit2(model.clusterCenters.map(_.toArray)))

    println("=== SEM (autoNlist x 64, semDedup iters 10) ===")
    val train = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>").as("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(10000)
      .as[(Long, Array[Double])].collect().map(_._2)
    val k = Similarity.autoNlist(emb.count())
    println(s"k=$k")
    println(lit2(Similarity.lloydCenters(train, k, iters = 10)))
    println("=== KM3 (3 x 3, n07 spark.ml seed 42 maxIter 20) ===")
    val sc3 = OfflineQueries.chunkScores(spark, d)
      .select(array_to_vector(array(col("s0"), col("s1"), col("s2"))).as("features"))
    val m3 = new KMeans().setK(3).setSeed(42).setMaxIter(20).fit(sc3)
    println(lit2(m3.clusterCenters.map(_.toArray)))
    // n09/n10 forecast MLP weights (8→24→12→3: 555 doubles, layer-major;
    // each affine layer = W column-major [numOut×numIn] then bias —
    // spark.ml FeedForwardModel's breeze unroll order). Deterministic
    // single-partition seeded fits, same code path as the queries.
    println("=== N09 weights (555, label = round(fut_avg)) ===")
    println(lit1(OfflineQueries.fitForecast(
      OfflineQueries.forecastFeatures(OfflineQueries.forecastRaw(spark, d))
        .withColumn("label", round(col("fut_avg")).cast("double"))).weights.toArray))
    println("=== N10 weights (555, soft replication targets, maxIter 400) ===")
    println(lit1(OfflineQueries.fitForecast(
      OfflineQueries.softForecastTrainset(
        OfflineQueries.forecastFeatures(OfflineQueries.forecastRaw(spark, d))),
      maxIter = 400, sortCols = Seq("stream_id", "chunk_id", "label")).weights.toArray))
    println("=== N05 candidates (cand_id, runtime, cost) ===")
    val base = graft.ops.TaskSim.detectToTrack(10, 60)
    val g = base.copy(tasks = base.tasks.map(t =>
      t.copy(inBytes = 200000, outBytes = 80000, rtCloud = t.rtSingle * 0.6)))
    graft.operators.KnobTuning.placementCandidates(g.tasks.length, 64).foreach {
      case (candId, placement) =>
        val gg = g.copy(tasks = g.tasks.zipWithIndex.map { case (t, i) =>
          t.copy(placement = placement(i)) })
        println(s"($candId, ${java.lang.Double.toString(gg.simulateRt(4))}, " +
          s"${java.lang.Double.toString(gg.simulateCost)}),")
    }
    spark.stop()
  }
}
