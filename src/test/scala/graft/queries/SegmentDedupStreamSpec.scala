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
      StreamingQueries.streamSegmentDedup(s, docs, fresh, hist, dir, fpt,
          histKey = Some(sfDir))
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

  test("n29's stated 100 TB form: update-mode owner upserts on RocksDB == the monoid state") {
    // The n28/CdcStreamSpec demonstration for segment dedup: the
    // first-occurrence owner state lives in RocksDB
    // (`RocksDBStateStoreProvider`) and the sink consumes UPDATE-mode
    // per-hash upserts instead of a complete-mode table — the two pieces
    // the catalog gate (complete mode + memory sink, bounded replay)
    // does not itself exercise. The upsert stream applied hash-by-hash
    // must land on exactly the owner set a batch min-struct computes.
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) * 3 / 4, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut).localCheckpoint(true)
    val histHashes = Dedup.segmentize(hist).select("h").distinct().localCheckpoint(true)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_seg_upsert/p${ProcessHandle.current().pid()}")
    fresh.repartition(4).write.mode("overwrite").parquet(dir)

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val upserted = scala.collection.mutable.Map.empty[String, (Long, Long, String)]
    val perBatchKeys = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    @volatile var rocksMetricSeen = false
    try {
      val stream = s.readStream.schema(StreamingQueries.segStageSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val owners = Dedup.segmentize(stream)
        .join(histHashes, Seq("h"), "left_anti")
        .groupBy("h")
        .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("own"))
        .select(col("h"), col("own.doc_id"), col("own.seg_idx").cast("long"), col("own.seg"))
      val query = owners.writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
            .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getString(3))))
          this.synchronized {
            perBatchKeys += rows.map(_._1).toSet
            rows.foreach { case (h, own) => upserted(h) = own }
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val prog = query.lastProgress
      rocksMetricSeen = prog != null && prog.stateOperators.nonEmpty &&
        prog.stateOperators.exists(_.customMetrics.keySet().toArray
          .exists(_.toString.startsWith("rocksdb")))
    } finally prevProvider match {
      case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    assert(rocksMetricSeen, "state operator did not report RocksDB metrics — provider not engaged")
    assert(perBatchKeys.length >= 3, s"expected >=3 micro-batches, got ${perBatchKeys.length}")
    // the cross-batch path must actually fire: some hash emitted in 2+ batches
    val multi = perBatchKeys.flatten.groupBy(identity).count(_._2.length >= 2)
    assert(multi > 0, "no segment hash was upserted across multiple micro-batches")
    // the upsert sink's final keyed state == the batch min-struct owner set
    val batchOwners = Dedup.segmentize(fresh)
      .join(histHashes, Seq("h"), "left_anti")
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("own"))
      .select(col("h"), col("own.doc_id"), col("own.seg_idx").cast("long"), col("own.seg"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(upserted.toMap == batchOwners,
      "update-mode upserts diverged from the batch owner set")
  }
}
