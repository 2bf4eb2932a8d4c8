package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming restart-recovery from `checkpointLocation` (r16 verdict
  * #2): the one production property a 100 TB pipeline exercises on
  * every driver restart and deploy, and the one thing the split-
  * invariance specs do NOT cover — they cut one query's input into
  * micro-batches, but never STOP a stateful query and RESUME it from
  * its checkpoint in a new query instance.
  *
  * Protocol (both state shapes): ingest wave 1 → the query drains
  * (AvailableNow) and terminates → wave 2 lands in the staging dir →
  * a NEW query instance starts from the SAME checkpointLocation →
  * the resumed query must (a) not re-read wave-1 files (source offsets
  * recovered), (b) merge wave-2 rows into the RESTORED keyed state
  * (RocksDB reloaded, not re-zeroed), and (c) land on exactly the
  * state a single uninterrupted run over wave1 ∪ wave2 computes — the
  * same oracle the split-invariance specs pin, now across a process-
  * lifetime boundary. Wave 2 deliberately carries SMALLER doc_ids than
  * wave 1, so the supersede/min-merge path must fire ACROSS the
  * restart — a query that silently re-zeroed its state would keep
  * wave-1 owners and fail the batch compare.
  *
  * Reference contract protected: the buffer/switcher continuity
  * semantics of `code/src/simulations/buffer.py:36-71` (state carried
  * across chunk boundaries) — here generalized to the at-rest keyed
  * state every streaming gate builds on.
  */
class RestartRecoverySpec extends SparkSpec {

  /** Run `plan` (built from a fresh readStream each call) to
    * completion under AvailableNow with the given checkpoint dir,
    * upserting update-mode rows into `sink` by key; returns
    * (rows read from the source, whether RocksDB metrics were seen,
    * keys touched this session). */
  private def drain(
      plan: org.apache.spark.sql.DataFrame,
      ckpt: String,
      sink: scala.collection.mutable.Map[String, Seq[Any]]): (Long, Boolean, Set[String]) = {
    val touched = scala.collection.mutable.Set.empty[String]
    val query = plan.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // column 0 is the state key (string), the rest the state value
        val rows = b.collect().map { r =>
          r.getString(0) -> (1 until r.length).map(r.get).toSeq
        }
        this.synchronized {
          rows.foreach { case (k, v) => sink(k) = v; touched += k }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val progress = query.recentProgress
    val rocks = progress.exists(p => p.stateOperators.nonEmpty &&
      p.stateOperators.exists(_.customMetrics.keySet().toArray
        .exists(_.toString.startsWith("rocksdb"))))
    (progress.map(_.numInputRows).sum, rocks, touched.toSet)
  }

  private def withRocksDb[T](body: => T): T = {
    val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }

  test("segment-dedup owner index survives stop + resume from checkpoint (n29 state shape)") {
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) / 2, lit(0L))
      .cast("long")).head.getLong(0)
    val hist = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut).localCheckpoint(true)
    // parity split (wave 1 = odd ids, wave 2 = even ids): duplicate-doc
    // pairs straddle the waves regardless of where they sit in the id
    // range, and every straddling pair whose even id is the smaller one
    // forces the min-struct supersede to fire ACROSS the restart (an
    // id-range split found no cross-wave duplicate segment at sf0.001)
    val wave1 = fresh.filter(col("doc_id") % 2 === 1)
    val wave2 = fresh.filter(col("doc_id") % 2 === 0)
    val histHashes = Dedup.segmentize(hist).select("h").distinct().localCheckpoint(true)
    val base = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_restart_seg/p${ProcessHandle.current().pid()}")
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"

    def owners() = {
      val stream = s.readStream.schema(StreamingQueries.segStageSchema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      Dedup.segmentize(stream)
        .join(histHashes, Seq("h"), "left_anti")
        .groupBy("h")
        .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("own"))
        .select(col("h"), col("own.doc_id"), col("own.seg_idx").cast("long"),
          col("own.seg"))
    }

    val upserted = scala.collection.mutable.Map.empty[String, Seq[Any]]
    withRocksDb {
      wave1.repartition(2).write.mode("overwrite").parquet(stage)
      val (in1, rocks1, _) = drain(owners(), ckpt, upserted)
      assert(in1 == wave1.count(), "session 1 did not read exactly wave 1")
      assert(rocks1, "session 1 state did not report RocksDB metrics")
      val afterSession1 = upserted.toMap

      wave2.repartition(2).write.mode("append").parquet(stage)
      val (in2, rocks2, touched2) = drain(owners(), ckpt, upserted)
      // (a) source offsets recovered: ONLY wave-2 rows are read
      assert(in2 == wave2.count(),
        s"resumed query re-read history: $in2 rows vs wave2 ${wave2.count()}")
      assert(rocks2, "resumed session did not report RocksDB metrics")

      // (b) the restored state actually superseded: some hash owned
      // after session 1 was re-emitted in session 2 with a SMALLER
      // owner doc_id (the min-merge crossed the restart)
      val superseded = touched2.filter { h =>
        afterSession1.get(h).exists(old =>
          old.head.asInstanceOf[Long] > upserted(h).head.asInstanceOf[Long])
      }
      assert(superseded.nonEmpty,
        "no owner was superseded across the restart — fixture vacuous")

      // (c) final state == single-session batch owner set over all fresh
      val batchOwners = Dedup.segmentize(fresh)
        .join(histHashes, Seq("h"), "left_anti")
        .groupBy("h")
        .agg(min(struct(col("doc_id"), col("seg_idx"), col("seg"))).as("own"))
        .select(col("h"), col("own.doc_id"), col("own.seg_idx").cast("long"),
          col("own.seg"))
        .collect()
        .map(r => r.getString(0) -> Seq[Any](r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      assert(upserted.toMap == batchOwners,
        "post-restart owner state diverged from the single-session batch owner set")
    }
  }

  test("minhash band min-k state survives stop + resume from checkpoint (n32 state shape)") {
    val s = spark
    import org.apache.spark.sql.Encoders
    val docs = Tables.documents(s, sfDir).select("doc_id", "text")
    val cut = docs.agg(coalesce((max(col("doc_id")) + 1) / 2, lit(0L))
      .cast("long")).head.getLong(0)
    val fresh = docs.localCheckpoint(true)
    val wave1 = fresh.filter(col("doc_id") >= cut)
    val wave2 = fresh.filter(col("doc_id") < cut)
    val base = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_restart_minhash/p${ProcessHandle.current().pid()}")
    val stage = s"$base/stage"; val ckpt = s"$base/ckpt"
    val maxBucket = 64
    val minK = udaf(new Dedup.MinKIdsAgg(maxBucket + 1), Encoders.scalaLong)

    def bandState() = {
      val stream = s.readStream.schema(StreamingQueries.segStageSchema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      Dedup.bandTable(Dedup.minhashSignatures(stream))
        .groupBy("band", "bsig")
        .agg(minK(col("doc_id")).as("docs"))
        .select(concat_ws("|", col("band"), col("bsig")).as("key"), col("docs"))
    }

    val upserted = scala.collection.mutable.Map.empty[String, Seq[Any]]
    withRocksDb {
      wave1.repartition(2).write.mode("overwrite").parquet(stage)
      val (in1, rocks1, _) = drain(bandState(), ckpt, upserted)
      assert(in1 == wave1.count(), "session 1 did not read exactly wave 1")
      assert(rocks1, "session 1 state did not report RocksDB metrics")
      val afterSession1 = upserted.toMap

      wave2.repartition(2).write.mode("append").parquet(stage)
      val (in2, rocks2, touched2) = drain(bandState(), ckpt, upserted)
      assert(in2 == wave2.count(),
        s"resumed query re-read history: $in2 rows vs wave2 ${wave2.count()}")
      assert(rocks2, "resumed session did not report RocksDB metrics")

      // the min-k merge crossed the restart: some key from session 1
      // was re-emitted in session 2 with new (smaller) members merged
      // into its restored set
      val merged = touched2.filter { k =>
        afterSession1.get(k).exists(_ != upserted(k))
      }
      assert(merged.nonEmpty,
        "no band key's min-k set changed across the restart — fixture vacuous")

      // final state == the batch min-k over wave1 ∪ wave2
      val batchState = Dedup.bandTable(Dedup.minhashSignatures(fresh))
        .groupBy("band", "bsig")
        .agg(minK(col("doc_id")).as("docs"))
        .select(concat_ws("|", col("band"), col("bsig")).as("key"), col("docs"))
        .collect()
        .map(r => r.getString(0) -> Seq[Any](r.getSeq[Long](1)))
        .toMap
      val finalState = upserted.toMap
      assert(finalState.keySet == batchState.keySet,
        "post-restart band key set diverged from the single-session batch state")
      val diverged = finalState.collect {
        case (k, v) if batchState(k) != v => k
      }
      assert(diverged.isEmpty,
        s"post-restart min-k sets diverged on ${diverged.take(3)}")
    }
  }
}
