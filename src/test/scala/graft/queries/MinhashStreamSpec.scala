package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** n32's batch-split invariance, boundary behavior and cap semantics
  * (r14 verdict #5's done-criteria): the streaming MinHash-LSH leg's
  * per-(band, bsig) state — a bounded min-(maxBucket+1) id set + the
  * probed history occupancy — is a mergeable monoid, so HOW the ingest
  * stream is cut into micro-batches must not change the verified pair
  * set, and the result must equal batch d02 over the unioned corpus
  * (whose DuckDB oracle n32 shares verbatim, so this spec transitively
  * pins the streaming leg to the oracle too).
  */
class MinhashStreamSpec extends SparkSpec {

  test("n32: micro-batch splits don't change the result; streaming == batch d02; cross-boundary pairs fire") {
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) * 3 / 4, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_minhash_stream/p${ProcessHandle.current().pid()}")
    // 4 files + maxFilesPerTrigger=1 → 4 micro-batches; repartition
    // hash-scatters doc ids so band buckets genuinely accumulate
    // members across batches (the min-k merge path runs)
    fresh.repartition(4).write.mode("overwrite").parquet(dir)

    def run(fpt: Option[Int]): Seq[(Long, Long, Double)] =
      StreamingQueries.streamMinhash(s, fresh, hist, dir, fpt,
          histKey = Some(sfDir))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq

    val multi = run(Some(1))
    val multiBatches = StreamingQueries.lastStreamBatches
    val single = run(None)
    val singleBatches = StreamingQueries.lastStreamBatches
    assert(multiBatches >= 3,
      s"staging did not split: $multiBatches input-bearing micro-batches")
    assert(singleBatches < multiBatches,
      s"control arm unexpectedly split too ($singleBatches vs $multiBatches)")

    val batch = Dedup.minhashNearDups(docs)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(multi == batch, "multi-batch streaming minhash diverged from batch d02")
    assert(single == multi, "batch-split changed the streaming result")
    assert(batch.nonEmpty, "no near-dup pairs at this SF — fixture too small to gate anything")
    // the CROSS-BOUNDARY path must fire: a history doc gains a verified
    // near-dup pair from a fresh arrival (the reason the at-rest index
    // is probed at all)
    assert(batch.exists(p => p._1 < cut && p._2 >= cut),
      "no hist×fresh pair at this SF — the probe path is untested")
  }

  test("n32's 100 TB form: changed-keys-only assembly is complete for the window and collapses the band-index scan") {
    // r15 verdict #5: the in-source claim "assembly restricted to keys
    // whose state CHANGED this ingest window" is now an implemented
    // form (changedOnly) — demonstrate both halves. (a) COMPLETENESS:
    // every pair the full assembly emits that INVOLVES a fresh doc (or
    // lives in a bucket fresh docs touched) is in the delta view —
    // fresh arrivals only create/kill pairs in changed buckets, so the
    // delta is exactly this window's pair churn; pairs the delta omits
    // are hist-only pairs prior windows already emitted. (b) SCAN
    // COLLAPSE: the band-index rows entering the delta assembly
    // (point-read via broadcast semi-join on the batch-bounded changed
    // keys) are a strict subset of the full corpus-wide scan.
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) * 3 / 4, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_minhash_delta/p${ProcessHandle.current().pid()}")
    fresh.repartition(2).write.mode("overwrite").parquet(dir)

    def run(changed: Boolean): (Set[(Long, Long)], Long) = {
      val pairs = StreamingQueries.streamMinhash(s, fresh, hist, dir, None,
          histKey = Some(sfDir), changedOnly = changed, probeScan = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (pairs, StreamingQueries.lastAssemblyScanRows)
    }
    val (full, fullScan) = run(changed = false)
    val (delta, deltaScan) = run(changed = true)

    // (a) delta ⊆ full, and every pair touching a fresh doc survives
    assert(delta.subsetOf(full), "delta assembly invented pairs")
    val freshSide = full.filter(p => p._1 >= cut || p._2 >= cut)
    assert(freshSide.nonEmpty, "no fresh-side pairs — fixture gates nothing")
    assert(freshSide.subsetOf(delta),
      "delta assembly lost a pair created by this window's arrivals")
    // (b) the point-read touches strictly fewer band-index rows
    assert(fullScan > 0, "scan probe did not fire")
    assert(deltaScan < fullScan,
      s"changed-keys point-read did not collapse the scan: $deltaScan vs $fullScan")
  }

  test("n32 planted cap: saturated bucket killed, pair kept, streaming == batch at maxBucket=2") {
    // The bounded-state semantics on a planted fixture: 6 copies of one
    // boilerplate text (2 history + 4 fresh) saturate the min-(k=3) set
    // (4 fresh distinct ids > 3 kept) — the bucket reads bn =
    // hbn + min(fn, 3) = 5, over the cap, so ALL its pairs die exactly
    // as d02's corpus-wide count (6) kills them: the capped count can
    // differ from the true count only when BOTH exceed maxBucket, so
    // the keep/kill verdict always agrees. The separate near-dup pair
    // (one side history, one side fresh) sits in buckets of size 2 and
    // must survive with its exact Jaccard.
    val s = spark
    import s.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog again and again today"
    val near1 = "completely different content about spark query engines running at massive scale"
    val near2 = "completely different content about spark query engines running at huge scale"
    val hist = Seq((0L, boiler), (1L, boiler), (10L, near1))
      .toDF("doc_id", "text").localCheckpoint(true)
    val fresh = Seq((20L, boiler), (21L, boiler), (22L, boiler), (23L, boiler),
        (30L, near2))
      .toDF("doc_id", "text").localCheckpoint(true)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_minhash_cap/p${ProcessHandle.current().pid()}")
    fresh.repartition(3).write.mode("overwrite").parquet(dir)

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val out = StreamingQueries.streamMinhash(s, fresh, hist, dir, Some(1),
        histKey = None, maxBucket = 2)
      .collect().map(key).toSet
    val batch = Dedup.minhashNearDups(
        hist.unionByName(fresh), maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == batch,
      s"planted-cap streaming != batch d02 at maxBucket=2: $out vs $batch")
    assert(out.contains((10L, 30L)), "the surviving near-dup pair is missing")
    val boilerIds = Set(0L, 1L, 20L, 21L, 22L, 23L)
    assert(!out.exists(p => boilerIds(p._1) && boilerIds(p._2)),
      "over-cap boilerplate bucket leaked pairs")
  }
}
