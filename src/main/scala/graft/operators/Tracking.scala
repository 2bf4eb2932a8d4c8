package graft.operators

import graft.ops.SortTracker
import graft.ops.SortTracker.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed SORT tracking over a detections table
  * (stream_id, frame, x1, y1, x2, y2, score).
  *
  * Scale design: `flatMapSortedGroups` keyed by stream_id gives each stream
  * a frame-ordered iterator WITHOUT materializing the group (Spark sorts
  * within partitions during the shuffle) — per-stream memory is just the
  * live tracker set, so an 8-day 30 fps stream streams through. Sequential
  * per stream — the reference's own constraint — parallel across streams,
  * which is the cluster's scale axis.
  */
object Tracking {

  final case class DetRow(
      stream_id: Long, frame: Long,
      x1: Double, y1: Double, x2: Double, y2: Double, score: Double)

  final case class TrackRow(
      stream_id: Long, frame: Long, track_id: Int,
      x1: Double, y1: Double, x2: Double, y2: Double)

  def track(dets: DataFrame, maxAge: Int = 1, minHits: Int = 3,
            iouThreshold: Double = 0.3): DataFrame = {
    val spark: SparkSession = dets.sparkSession
    import spark.implicits._

    dets.select(
        col("stream_id").cast("long"), col("frame").cast("long"),
        col("x1").cast("double"), col("y1").cast("double"),
        col("x2").cast("double"), col("y2").cast("double"),
        col("score").cast("double"))
      .as[DetRow]
      .groupByKey(_.stream_id)
      // within-frame order is part of SORT's observable behavior (new-track
      // id assignment follows detection order), so sort the full tuple —
      // partition-arrival order must never leak into track ids
      .flatMapSortedGroups($"frame".asc, $"x1".asc, $"y1".asc, $"x2".asc,
        $"y2".asc, $"score".asc) { (sid: Long, it: Iterator[DetRow]) =>
        val tracker = new SortTracker(maxAge, minHits, iouThreshold)
        val in = it.buffered
        new Iterator[Seq[TrackRow]] {
          private var lastFrame = -1L
          def hasNext: Boolean = in.hasNext
          def next(): Seq[TrackRow] = {
            // gather one frame's detections (iterator is frame-sorted)
            val f = in.head.frame
            val frameDets = scala.collection.mutable.ArrayBuffer.empty[Det]
            while (in.hasNext && in.head.frame == f) {
              val d = in.next()
              frameDets += Det(d.x1, d.y1, d.x2, d.y2, d.score)
            }
            // SORT requires an update per frame, even empty ones
            var out = Seq.empty[TrackRow]
            var cur = if (lastFrame < 0) f else lastFrame + 1
            while (cur <= f) {
              val dets = if (cur == f) frameDets.toArray else Array.empty[Det]
              val res = tracker.update(dets)
              if (cur == f)
                out = res.map(t => TrackRow(sid, f, t.trackId, t.x1, t.y1, t.x2, t.y2)).toSeq
              cur += 1
            }
            lastFrame = f
            out
          }
        }.flatten
      }
      .toDF()
  }
}
