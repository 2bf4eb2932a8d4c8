package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** n30's batch-split invariance and retroactivity (r13 verdict #2's
  * done-criteria): the streaming span dedup's per-fingerprint
  * (min_doc, max_doc, hist_hit) state is a mergeable monoid, so HOW the
  * ingest stream is cut into micro-batches must not change the scrubbed
  * corpus — and the result must equal batch d17 over the unioned corpus
  * (whose DuckDB oracle n30 shares verbatim, so this spec transitively
  * pins the streaming leg to the oracle too). Span dedup is the one
  * dedup stage where fresh arrivals RETROACTIVELY change history docs'
  * output (a history-unique gram becomes duplicated when a fresh copy
  * lands) — the spec asserts that path actually fires at this SF.
  */
class SpanScrubStreamSpec extends SparkSpec {

  test("n30: micro-batch splits don't change the result; streaming == batch d17; retroactive") {
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) * 3 / 4, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_span_stream/p${ProcessHandle.current().pid()}")
    // 4 files + maxFilesPerTrigger=1 → 4 micro-batches; repartition
    // hash-scatters doc ids across files, so later batches carry EARLIER
    // doc ids and the min/max/hist_hit supersede path genuinely runs
    fresh.repartition(4).write.mode("overwrite").parquet(dir)

    def run(fpt: Option[Int]): Seq[(Long, Long, Long, Long, String)] =
      StreamingQueries.streamSpanScrub(s, docs, fresh, hist, dir, fpt,
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

    val batch = Dedup.scrubSpans(docs, Dedup.dupSpans(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1).toSeq
    assert(multi == batch, "multi-batch streaming span scrub diverged from batch d17")
    assert(single == multi, "batch-split changed the streaming result")
    // the fixture must exercise real surgery, or the equalities are vacuous
    assert(batch.exists(_._4 > 0), "no removed tokens at this SF — fixture too small")
    // RETROACTIVITY must fire: some HISTORY doc loses tokens under the
    // union that it keeps when history is scrubbed alone — i.e. a fresh
    // arrival invalidated a previously-unique history span (the property
    // segment dedup lacks and span dedup must handle)
    val histAlone = Dedup.scrubSpans(hist, Dedup.dupSpans(hist))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val unionRemoved = batch.map(r => r._1 -> r._4).toMap
    val retro = histAlone.keys.filter(id => unionRemoved(id) > histAlone(id))
    assert(retro.nonEmpty,
      "no history doc's scrub changed with the fresh arrivals — retroactive path untested")
  }

  test("n30's 100 TB form: update-mode fingerprint-stat upserts on RocksDB == the monoid state") {
    // The n29/CdcStreamSpec demonstration for span dedup: the
    // per-fingerprint (min_doc, max_doc, hist_hit) state lives in
    // RocksDB and the sink consumes UPDATE-mode per-key upserts — the
    // upsert stream applied key-by-key (last wins) must land on exactly
    // the stats a batch aggregate computes, and some key must be
    // upserted across 2+ batches (the supersede path).
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) * 3 / 4, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut).localCheckpoint(true)
    val histStats = Dedup.spanOcc(hist).groupBy("h1", "h2")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .localCheckpoint(true)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_span_upsert/p${ProcessHandle.current().pid()}")
    fresh.repartition(4).write.mode("overwrite").parquet(dir)

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val upserted = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Long)]
    val perBatchKeys = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    @volatile var rocksMetricSeen = false
    try {
      val stream = s.readStream.schema(StreamingQueries.segStageSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val stats = Dedup.spanOcc(stream)
        .join(histStats.select(col("h1"), col("h2"), lit(1L).as("hist_hit")),
          Seq("h1", "h2"), "left")
        .select(col("doc_id"), col("h1"), col("h2"),
          coalesce(col("hist_hit"), lit(0L)).as("hh"))
        .groupBy("h1", "h2")
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
          max(col("hh")).as("hh"))
      val query = stats.writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
            .map(r => ((r.getLong(0), r.getLong(1)),
              (r.getLong(2), r.getLong(3), r.getLong(4))))
          this.synchronized {
            perBatchKeys += rows.map(_._1).toSet
            rows.foreach { case (k, v) => upserted(k) = v }
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
    val multi = perBatchKeys.flatten.groupBy(identity).count(_._2.length >= 2)
    assert(multi > 0, "no fingerprint was upserted across multiple micro-batches")
    // the upsert sink's final keyed state == the batch min/max/hist_hit stats
    val batchStats = Dedup.spanOcc(fresh)
      .join(histStats.select(col("h1"), col("h2"), lit(1L).as("hist_hit")),
        Seq("h1", "h2"), "left")
      .select(col("doc_id"), col("h1"), col("h2"),
        coalesce(col("hist_hit"), lit(0L)).as("hh"))
      .groupBy("h1", "h2")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
        max(col("hh")).as("hh"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(upserted.toMap == batchStats,
      "update-mode upserts diverged from the batch fingerprint stats")
  }
}
