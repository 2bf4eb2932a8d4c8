package graft.streaming

import graft.control.{Replay, Switcher}
import graft.ops.SortTracker
import graft.ops.SortTracker.Det
import graft.operators.Tracking.{DetRow, TrackRow}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the stateful operators (SURVEY ST1-ST4):
  * the same pure kernels (SortTracker, Switcher) carried as
  * flatMapGroupsWithState state, one state object per stream key.
  *
  * Ordering: rows within a micro-batch are sorted in memory per key (a
  * micro-batch holds seconds of one stream — bounded); ordering ACROSS
  * batches relies on per-stream sequential ingestion, which is the
  * reference's own operating assumption (supp. N.2 — the switcher/UDF
  * dependency is strictly sequential per stream). When that assumption is
  * violated (a file source splitting batches, a late detector write), the
  * tracker DROPS the late frames without touching its state and counts
  * them in the `graft.trackStream.lateRows` accumulator — bounded data
  * loss that is visible, never silent track corruption. Scale comes from
  * the number of independent streams, exactly as in batch mode.
  */
object StreamingOps {

  /** Streaming SORT tracking: detections stream in, confirmed tracks
    * stream out; tracker state persists across micro-batches.
    */
  def trackStream(dets: DataFrame, maxAge: Int = 1, minHits: Int = 3,
                  iouThreshold: Double = 0.3): DataFrame = {
    val spark = dets.sparkSession
    import spark.implicits._
    // COMPACT state: the tracker's flat snapshot (ints + double arrays)
    // under the product encoder — an UnsafeRow of ~470 bytes/track the
    // state store can hold without kryo (no object-graph metadata, no
    // dependence on Breeze class layout; see SortTracker.snapshot)
    implicit val stateEnc: org.apache.spark.sql.Encoder[TrackerState] =
      Encoders.product[TrackerState]
    // counts rows that arrived in a later micro-batch than a frame the
    // tracker already processed — observable via
    // spark.sparkContext.longAccumulator registry / the Spark UI
    val lateRows = spark.sparkContext.longAccumulator("graft.trackStream.lateRows")

    dets.select(
        col("stream_id").cast("long"), col("frame").cast("long"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"),
        col("score").cast("double"))
      .as[DetRow]
      .groupByKey(_.stream_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sid: Long, it: Iterator[DetRow], state: GroupState[TrackerState]) =>
          val tracker = state.getOption
            .map(s => SortTracker.restore(s.snap, maxAge, minHits, iouThreshold))
            .getOrElse(new SortTracker(maxAge, minHits, iouThreshold))
          val st = TrackerLoop(tracker, state.getOption.map(_.lastFrame).getOrElse(-1L))
          // within-frame order is part of SORT's observable behavior (as in
          // the batch path, Tracking.track): sort the full tuple so
          // micro-batch arrival order never leaks into track-id assignment
          val byFrame = it.toSeq
            .sortBy(d => (d.frame, d.x1, d.y1, d.x2, d.y2, d.score))
            .groupBy(_.frame).toSeq.sortBy(_._1)
          val out = Seq.newBuilder[TrackRow]
          var last = st.lastFrame
          byFrame.foreach { case (f, rows) =>
            if (last >= 0 && f <= last) {
              // A frame the tracker already advanced past arrived in a later
              // micro-batch (file source split the input, or a genuinely
              // late detector write). Re-running it would corrupt track
              // identity, and regressing `last` would replay empty-detection
              // updates over the gap — drop the rows, KEEP the state, and
              // count the loss instead of silently corrupting tracks.
              lateRows.add(rows.size.toLong)
            } else {
              // SORT needs one update per frame, including empty gaps
              var cur = if (last < 0) f else last + 1
              while (cur <= f) {
                val frameDets =
                  if (cur == f) rows.map(d => Det(d.x1, d.y1, d.x2, d.y2, d.score)).toArray
                  else Array.empty[Det]
                val res = st.tracker.update(frameDets)
                if (cur == f)
                  out ++= res.map(t => TrackRow(sid, f, t.trackId, t.x1, t.y1, t.x2, t.y2))
                cur += 1
              }
              last = f
            }
          }
          state.update(TrackerState(st.tracker.snapshot, last))
          out.result().iterator
      }
      .toDF()
  }

  /** Streaming knob switcher: per-chunk score rows in, decision log out;
    * buffer/plan/counter state persists across micro-batches.
    */
  def switchStream(chunks: DataFrame, mkSwitcher: () => Switcher): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    // compact state, same contract as trackStream: only the switcher's
    // MUTABLE state rides the state store (counters + plan + buffer
    // queue as a product-encoded row); the static profile/planner config
    // is rebuilt from mkSwitcher() on every restore
    implicit val stateEnc: org.apache.spark.sql.Encoder[SwitcherState] =
      Encoders.product[SwitcherState]
    // same contract as trackStream: a chunk the switcher already decided
    // past must not re-enter the sequential decision loop
    val lateRows = spark.sparkContext.longAccumulator("graft.switchStream.lateRows")

    chunks.select(col("stream_id").cast("long"), col("chunk_id").cast("long"),
        col("s0").cast("double"), col("s1").cast("double"), col("s2").cast("double"))
      .as[(Long, Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sid: Long, it: Iterator[(Long, Long, Double, Double, Double)],
         state: GroupState[SwitcherState]) =>
          val switcher = mkSwitcher()
          state.getOption.foreach(s => switcher.restore(s.snap))
          var first = state.getOption.forall(_.first)
          var curScore = state.getOption.map(_.curScore).getOrElse(0.0)
          var lastChunk = state.getOption.map(_.lastChunk).getOrElse(-1L)
          val rows = it.toSeq.sortBy(_._2)
          val (late, ordered) = rows.partition(_._2 <= lastChunk)
          if (late.nonEmpty) lateRows.add(late.size.toLong)
          val out = ordered.map { case (_, chunkId, s0, s1, s2) =>
            val scores = Array(s0, s1, s2)
            lastChunk = chunkId
            if (first) {
              first = false
              curScore = scores(0)
              (sid, chunkId, 0, 0, 0.0, 0.0, curScore)
            } else {
              val (config, placement, cost, rt) = switcher.switch(curScore)
              curScore = scores(config)
              (sid, chunkId, config, placement, cost, rt, curScore)
            }
          }
          state.update(SwitcherState(switcher.snapshot, first, curScore, lastChunk))
          out.iterator
      }
      .toDF("stream_id", "chunk_id", "config", "placement", "cloud_cost", "runtime_s", "score")
  }

  /** Streaming windowed z-score anomaly detection (q47's streaming twin):
    * per key, a bounded ring of the last `window` integer readings rides
    * the state store (product-encoded longs — the compact-state
    * convention); each arriving reading scores against the ring BEFORE
    * being pushed, emitting only |z| > threshold. State is O(window) per
    * key forever; the same late-arrival contract as trackStream (rows at
    * or before the last scored event are dropped and counted, never
    * reordered into the ring).
    */
  def zscoreStream(readings: DataFrame, window: Int = 20,
                   threshold: Double = 2.5): DataFrame = {
    val spark = readings.sparkSession
    import spark.implicits._
    implicit val stateEnc: org.apache.spark.sql.Encoder[ZscoreState] =
      Encoders.product[ZscoreState]
    val lateRows = spark.sparkContext.longAccumulator("graft.zscoreStream.lateRows")
    readings.select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("v").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, Long, Long)], state: GroupState[ZscoreState]) =>
          val st = state.getOption.getOrElse(ZscoreState(Seq.empty, -1L))
          val ring = scala.collection.mutable.Queue(st.ring: _*)
          var lastEvent = st.lastEvent
          val rows = it.toSeq.sortBy(_._2)
          val (late, ordered) = rows.partition(_._2 <= lastEvent)
          if (late.nonEmpty) lateRows.add(late.size.toLong)
          val out = Seq.newBuilder[(Long, Long, Long, Double)]
          ordered.foreach { case (_, eid, v) =>
            if (ring.size == window) {
              val n = ring.size.toLong
              val sv = ring.sum
              val sq = ring.map(x => x * x).sum
              // exact integer moments; one sqrt + one division — the same
              // arithmetic (same doubles) as the batch q47 expression
              if (n * sq > sv * sv) {
                val z = (v * n - sv).toDouble / math.sqrt((n * sq - sv * sv).toDouble)
                if (math.abs(z) > threshold)
                  // HALF_UP to match the batch expression's round(z, 4)
                  out += ((uid, eid, v, BigDecimal(z)
                    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
              }
            }
            ring.enqueue(v)
            if (ring.size > window) { ring.dequeue(); () }
            lastEvent = eid
          }
          state.update(ZscoreState(ring.toSeq, lastEvent))
          out.result().iterator
      }
      .toDF("user_id", "event_id", "v", "z")
  }

  /** Streaming exact dedup: drop documents whose content fingerprint was
    * already seen within the watermark horizon (state is bounded by the
    * watermark — the streaming form of Dedup.exact for a 100 TB ingest
    * firehose).
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 minute"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Event-time session windows (the streaming twin of
    * Sessionize.sessionize): per-key sessions merge while consecutive
    * events are < gap apart; a session is emitted (append mode) once the
    * watermark passes its end (= last event + gap). State per open
    * session only — the watermark bounds it, which is what makes
    * gap-sessions viable on an unbounded 100 TB stream.
    */
  def sessionQuality(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 second"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("v").as("value_sum_milli"))
      .select(unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n_events"), col("value_sum_milli"))

  /** Event-time windowed quality totals with a watermark (the A1 sums in
    * streaming form; late data beyond the watermark is dropped).
    */
  def windowedQuality(events: DataFrame, window: String = "2 seconds",
                      watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("stream_id"))
      .agg(count(lit(1)).as("n"), sum("score").as("sum_quality"))
      .select(col("window.start").as("window_start"), col("stream_id"),
        col("n"), col("sum_quality"))
}

/** Compact streaming tracker state: the tracker's flat snapshot + the
  * last processed frame. Product-encoded (UnsafeRow) — no kryo.
  */
final case class TrackerState(snap: SortTracker.Snapshot, lastFrame: Long)

/** In-batch working pair (never stored). */
final case class TrackerLoop(tracker: SortTracker, lastFrame: Long)

/** Compact streaming z-score state: last-`window` readings + replay
  * cursor. Product-encoded (UnsafeRow) — no kryo.
  */
final case class ZscoreState(ring: Seq[Long], lastEvent: Long)
/** Compact streaming switcher state: mutable-state snapshot + replay
  * cursor. Product-encoded (UnsafeRow) — no kryo.
  */
final case class SwitcherState(snap: Switcher.Snapshot, first: Boolean,
                               curScore: Double, lastChunk: Long)
