package graft.ops

import scala.collection.mutable.ArrayBuffer

/** SORT multi-object tracker core (reference: sort.py:199-253) —
  * Kalman-predict → IoU-associate (greedy shortcut, else Hungarian) →
  * update/spawn/evict → emit confirmed tracks.
  *
  * Pure sequential state machine, one instance per stream. At scale it
  * runs inside `flatMapGroupsWithState` keyed by stream_id (streaming) or
  * `flatMapGroups` over frame-sorted groups (batch): sequential within a
  * stream — the reference's own constraint (supp. N.2) — parallel across
  * the thousands of streams a cluster ingests.
  */
final class SortTracker(
    maxAge: Int = 1,
    minHits: Int = 3,
    iouThreshold: Double = 0.3) extends Serializable {

  import SortTracker._

  private var frameCount = 0
  private var nextId = 0
  private val trackers = ArrayBuffer.empty[Track]

  /** IoU of two [x1,y1,x2,y2] boxes (iou_batch, sort.py:47-63). */
  private def iou(d: Det, t: (Double, Double, Double, Double)): Double = {
    val xx1 = math.max(d.x1, t._1); val yy1 = math.max(d.y1, t._2)
    val xx2 = math.min(d.x2, t._3); val yy2 = math.min(d.y2, t._4)
    val w = math.max(0.0, xx2 - xx1); val h = math.max(0.0, yy2 - yy1)
    val inter = w * h
    inter / ((d.x2 - d.x1) * (d.y2 - d.y1) +
      (t._3 - t._1) * (t._4 - t._2) - inter)
  }

  /** Process one frame's detections; returns confirmed (trackId, bbox). */
  def update(dets: Array[Det]): Array[TrackOut] = {
    frameCount += 1

    // predict all live trackers; drop numerically-dead ones (NaN states)
    val preds = trackers.map { t => t.predict(); t.bbox }
    val valid = preds.zipWithIndex.filter { case (b, _) =>
      !(b._1.isNaN || b._2.isNaN || b._3.isNaN || b._4.isNaN)
    }
    val dead = preds.zipWithIndex.collect { case (b, i) if b._1.isNaN || b._2.isNaN || b._3.isNaN || b._4.isNaN => i }
    dead.reverse.foreach(trackers.remove)
    val trks = trackers.toArray // aligned with valid predictions after removal

    // associate: IoU matrix; if it is already a partial permutation above
    // threshold use it greedily, else Hungarian on -IoU (sort.py:163-170)
    val iouM = Array.tabulate(dets.length, trks.length)((d, t) => iou(dets(d), trks(t).bbox))
    val matches = ArrayBuffer.empty[(Int, Int)]
    val matchedD = new Array[Boolean](dets.length)
    val matchedT = new Array[Boolean](trks.length)

    if (dets.nonEmpty && trks.nonEmpty) {
      val above = iouM.map(_.map(x => if (x > iouThreshold) 1 else 0))
      val rowMax = above.map(_.sum).foldLeft(0)(math.max)
      val colMax = (0 until trks.length)
        .map(j => above.map(_(j)).sum).foldLeft(0)(math.max)
      val cand: Seq[(Int, Int)] =
        if (rowMax <= 1 && colMax <= 1) {
          for {
            d <- 0 until dets.length; t <- 0 until trks.length
            if above(d)(t) == 1
          } yield (d, t)
        } else {
          val assign = Hungarian.solve(iouM.map(_.map(-_)))
          assign.zipWithIndex.collect { case (t, d) if t >= 0 => (d, t) }.toSeq
        }
      // filter matched pairs below the IoU threshold (sort.py:183-190)
      cand.foreach { case (d, t) =>
        if (iouM(d)(t) >= iouThreshold) {
          matches += ((d, t)); matchedD(d) = true; matchedT(t) = true
        }
      }
    }

    matches.foreach { case (d, t) => trks(t).update(dets(d)) }

    // new trackers for unmatched detections
    for (d <- dets.indices if !matchedD(d)) {
      trackers += new Track(nextId, dets(d))
      nextId += 1
    }

    // emit confirmed; evict stale (sort.py:242-250)
    val out = ArrayBuffer.empty[TrackOut]
    var i = trackers.length - 1
    while (i >= 0) {
      val t = trackers(i)
      if (t.timeSinceUpdate < 1 && (t.hitStreak >= minHits || frameCount <= minHits)) {
        val b = t.bbox
        out += TrackOut(t.id + 1, b._1, b._2, b._3, b._4) // +1: MOT ids positive
      }
      if (t.timeSinceUpdate > maxAge) trackers.remove(i)
      i -= 1
    }
    out.reverse.toArray
  }

  /** Flat, product-encodable state snapshot — the compact streaming-state
    * form ([[SortTracker.restore]] is its exact inverse). Per track:
    * 4 ints + 56 doubles (~470 bytes as an UnsafeRow) versus a kryo blob
    * of the object graph (class metadata + Breeze matrix wrappers per
    * track); and the state-store row no longer depends on kryo's
    * class-layout stability across library versions.
    */
  def snapshot: SortTracker.Snapshot =
    SortTracker.Snapshot(frameCount, nextId, trackers.map(_.snap).toSeq)
}

object SortTracker {

  /** One track's flat state: lifecycle counters + Kalman x (7) and P (49,
    * column-major).
    */
  final case class TrackSnap(id: Int, timeSinceUpdate: Int, hitStreak: Int,
                             age: Int, x: Seq[Double], p: Seq[Double])

  /** Whole-tracker flat state. */
  final case class Snapshot(frameCount: Int, nextId: Int, tracks: Seq[TrackSnap])

  /** Rebuild a tracker from a snapshot (exact: restored doubles are the
    * snapshot's, bit for bit; spec-checked by a mid-stream
    * snapshot/restore producing identical subsequent output).
    */
  def restore(s: Snapshot, maxAge: Int = 1, minHits: Int = 3,
              iouThreshold: Double = 0.3): SortTracker = {
    val tr = new SortTracker(maxAge, minHits, iouThreshold)
    tr.frameCount = s.frameCount
    tr.nextId = s.nextId
    s.tracks.foreach(ts => tr.trackers += Track.restore(ts))
    tr
  }
  /** One detection: [x1,y1,x2,y2] + score. */
  final case class Det(x1: Double, y1: Double, x2: Double, y2: Double, score: Double)
  final case class TrackOut(trackId: Int, x1: Double, y1: Double, x2: Double, y2: Double)

  /** One live track: Kalman filter + lifecycle counters (sort.py:94-151). */
  private final class Track private (private val kf: Kalman7) extends Serializable {
    def this(trackId: Int, first: Det) = {
      this(Kalman7.fromBbox(first.x1, first.y1, first.x2, first.y2))
      id = trackId
    }
    var id: Int = 0
    var timeSinceUpdate = 0
    var hitStreak = 0
    var age = 0

    def snap: TrackSnap = TrackSnap(id, timeSinceUpdate, hitStreak, age,
      kf.snapshotX.toSeq, kf.snapshotP.toSeq)

    def predict(): Unit = {
      if (kf.x(6) + kf.x(2) <= 0) kf.x(6) = 0.0
      kf.predict()
      age += 1
      if (timeSinceUpdate > 0) hitStreak = 0
      timeSinceUpdate += 1
    }

    def update(d: Det): Unit = {
      timeSinceUpdate = 0
      hitStreak += 1
      kf.update(Kalman7.bboxToZ(d.x1, d.y1, d.x2, d.y2))
    }

    def bbox: (Double, Double, Double, Double) = Kalman7.xToBbox(kf.x)
  }

  private object Track {
    def restore(s: TrackSnap): Track = {
      val t = new Track(Kalman7.restore(s.x.toArray, s.p.toArray))
      t.id = s.id
      t.timeSinceUpdate = s.timeSinceUpdate
      t.hitStreak = s.hitStreak
      t.age = s.age
      t
    }
  }
}
