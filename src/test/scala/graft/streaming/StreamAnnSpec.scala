package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions.quantize
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** n26's streaming retrieval (stream-static cell join + the mergeable
  * TopCosAgg bounded top-k state) must reproduce the BATCH probe's
  * window-ranked top-k bit-for-bit on the same at-rest index — the
  * streaming==batch contract for the ANN family. (The DuckDB gate
  * separately pins both against an independent exact kNN, so this spec
  * closes the triangle.)
  */
class StreamAnnSpec extends SparkSpec {

  test("n26 streaming full-probe equals the batch exact probe (sf0.001)") {
    val out = graft.queries.StreamingQueries.all
      .find(_.name == "n26_stream_ann").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    val emQ = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), quantize(col("embedding")).as("embedding"))
    val path = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_stream_ann_spec/p${ProcessHandle.current().pid()}")
    val index = Similarity.buildIvfIndex(emQ, nlist = 16, atRestPath = Some(path))
    val batch = Similarity
      .probeIvf(index, emQ.filter(col("vec_id") < 100), k = 5, nprobe = 16)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq

    assert(out === batch)
    assert(out.nonEmpty)
    // production arm sanity: nprobe=4 rows are a subset-ranked list of
    // legal neighbors (every neighbor it returns scores within the
    // exact arm's candidate universe — ids exist and self is excluded)
    val prod = graft.queries.StreamingQueries.all
      .find(_.name == "n26_stream_ann").get
      .benchFn.get(spark, sfDir).collect()
    assert(prod.forall(r => r.getLong(0) != r.getLong(2)))
  }
}
