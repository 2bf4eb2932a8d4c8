package graft.streaming

import graft.control.Switcher
import graft.operators.Multimodal.FrameRow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's full online path (SURVEY Q1/Q3) as one Structured
  * Streaming pipeline:
  *
  *   frame stream → decode (stub seam) → detector (stub seam)
  *     → SORT tracking (FMGWS state) → 2 s event-time quality windows
  *     → knob switcher (FMGWS state)
  *
  * The reference builds this chunk barrier manually with asyncio/Ray
  * futures; here micro-batches + watermarks give it for free, cloud
  * placement survives as a cost column, and each stage scales with the
  * number of independent streams.
  */
object VetlPipeline {

  /** STUB detector over decoded frames: deterministic linearly-moving
    * boxes whose confidence is modulated by the decoded luma (the M1 seam
    * — a real model slots into the same per-partition kernel).
    */
  def detectStub(frames: DataFrame, objectsPerStream: Int = 2): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.as[FrameRow]
      .mapPartitions { it =>
        it.flatMap { f =>
          val luma = f.data.drop(4).map(b => (b & 0xff).toDouble).sum / (f.data.length - 4)
          (0 until objectsPerStream).iterator.map { obj =>
            val x1 = 80.0 + 2.0 * f.frame + 400.0 * obj + 15.0 * f.stream_id
            val y1 = 60.0 + 1.5 * f.frame + 120.0 * obj
            (f.stream_id, f.frame, x1, y1, x1 + 70.0, y1 + 90.0,
              0.5 + luma / 512.0)
          }
        }
      }
      .toDF("stream_id", "frame", "x1", "y1", "x2", "y2", "score")
  }

  /** Frame number → event time (30 fps from a fixed epoch). */
  def frameTime(frameCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_millis(lit(1704067200000L) + (frameCol * 33L))

  /** Tracks per 2 s window per stream + mean confidence — the per-chunk
    * quality signal the switcher consumes.
    */
  def windowedTrackQuality(tracks: DataFrame, detScores: DataFrame): DataFrame = {
    val scored = tracks.join(detScores, Seq("stream_id", "frame"))
    scored
      .withColumn("ts", frameTime(col("frame")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "2 seconds"), col("stream_id"))
      .agg(approx_count_distinct(col("track_id")).as("n_tracks"),
        count(lit(1)).as("n_boxes"),
        avg("score").as("mean_score"))
      .select(col("window.start").as("chunk_start"), col("stream_id"),
        col("n_tracks"), col("n_boxes"), col("mean_score"))
  }

  /** Full pipeline: frames in, confirmed tracks out (the quality windows
    * and switcher are composed by the caller from the tracks stream —
    * see VetlPipelineSpec).
    */
  def tracksFromFrames(frames: DataFrame): DataFrame =
    StreamingOps.trackStream(detectStub(frames))

  /** Event time (ms) a frame number maps to — sentinel cutoff arithmetic. */
  val epochMs = 1704067200000L

  /** INTEGER-EXACT windowed quality — the m05/n23 gate composition. Same
    * shape as [[windowedTrackQuality]], but the score aggregate is a
    * quantized long sum + integer division (sum order can't move a bit)
    * and windows at/after `cutoffMs` are dropped (the streaming twin
    * feeds far-future sentinel frames to close the real windows under
    * append mode; the sentinels' own windows fall past the cutoff on
    * both twins). Runs unchanged on a batch OR streaming `tracks` input
    * (the watermark node is eliminated on batch plans), which is what
    * lets one golden check batch == streaming end-to-end.
    */
  def qualityGateWindows(tracks: DataFrame, detScores: DataFrame,
                         cutoffMs: Long): DataFrame =
    tracks.join(detScores, Seq("stream_id", "frame"))
      .withColumn("ts", frameTime(col("frame")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "2 seconds"), col("stream_id"))
      .agg(approx_count_distinct(col("track_id")).as("n_tracks"),
        count(lit(1)).as("n_boxes"),
        sum(floor(col("score") * 1e6).cast("long")).as("score_q_sum"))
      .filter(col("window.start") < timestamp_millis(lit(cutoffMs)))
      .select(col("window.start").cast("string").as("chunk_start"),
        col("stream_id"), col("n_tracks"), col("n_boxes"),
        expr("score_q_sum div n_boxes").as("score_micro"))

  /** Far-future copies of a few frames: advances the streaming watermark
    * past every real window so append mode emits them all; their own
    * windows land past the gate cutoff. Shared by both twins so tracker
    * state evolution is identical.
    */
  def withSentinels(frames: DataFrame, offset: Long = 30000L): DataFrame =
    frames.unionByName(
      frames.filter(col("stream_id") === 0 && col("frame") < 10)
        .withColumn("frame", col("frame") + offset))
}
