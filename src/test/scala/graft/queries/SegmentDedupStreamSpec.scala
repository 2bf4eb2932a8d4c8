package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** n29's batch-split invariance (r12 verdict #5's done-criterion): the
  * streaming segment dedup's first-occurrence state is a mergeable
  * min-struct monoid, so HOW the ingest stream is cut into micro-batches
  * must not change the deduped corpus — and the result must equal batch
  * d18 over the unioned corpus (whose DuckDB oracle n29 shares verbatim,
  * so this spec transitively pins the streaming leg to the oracle too).
  */
class SegmentDedupStreamSpec extends SparkSpec {

  test("n29: micro-batch splits don't change the result; streaming == batch d18") {
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) * 3 / 4, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_seg_stream/p${ProcessHandle.current().pid()}")
    // 4 files + maxFilesPerTrigger=1 → 4 micro-batches; repartition
    // hash-scatters doc ids across files, so later batches carry EARLIER
    // doc ids and the min-struct supersede path genuinely runs
    fresh.repartition(4).write.mode("overwrite").parquet(dir)

    def run(fpt: Option[Int]): Seq[(Long, Long, Long, Long, String)] =
      StreamingQueries.streamSegmentDedup(s, docs, fresh, hist, dir, fpt)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .sortBy(_._1).toSeq

    val multi = run(Some(1))
    val multiBatches = StreamingQueries.lastStreamBatches
    val single = run(None)
    val singleBatches = StreamingQueries.lastStreamBatches
    assert(multiBatches >= 3,
      s"staging did not split: $multiBatches input-bearing micro-batches")
    assert(singleBatches < multiBatches,
      s"control arm unexpectedly split too ($singleBatches vs $multiBatches)")

    val batch = Dedup.segmentDedup(Tables.documents(s, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq
    assert(multi == batch, "multi-batch streaming dedup diverged from batch d18")
    assert(single == multi, "batch-split changed the streaming result")
    // the fixture must exercise real removals, or the equalities are vacuous
    assert(batch.exists(_._4 > 0), "no removed segments at this SF — fixture too small")
  }
}
