package graft.ops

import graft.ops.SortTracker.Det
import org.scalatest.funsuite.AnyFunSuite

class SortTrackerSpec extends AnyFunSuite {

  private def box(x: Double, y: Double): Det = Det(x, y, x + 50, y + 80, 0.9)

  test("single moving object keeps one stable track id") {
    val t = new SortTracker()
    val ids = (0 until 20).flatMap { f =>
      t.update(Array(box(100 + 3.0 * f, 200 + 2.0 * f))).map(_.trackId)
    }
    assert(ids.nonEmpty)
    assert(ids.distinct.length == 1, s"expected one id, got ${ids.distinct}")
  }

  test("mid-stream snapshot/restore continues bit-identically to the original") {
    // two crossing objects + a death/respawn so the snapshot carries live,
    // coasting AND recently-spawned tracks
    def dets(f: Int): Array[Det] = {
      val a = if (f < 25 || f > 30) Seq(box(100 + 4.0 * f, 200 + 1.0 * f)) else Seq.empty
      val b = Seq(box(600 - 4.0 * f, 210 + 1.0 * f))
      (a ++ b).toArray
    }
    val full = new SortTracker()
    val expected = (0 until 40).map(f => full.update(dets(f)).toSeq)

    val first = new SortTracker()
    (0 until 17).foreach(f => first.update(dets(f)))
    val resumed = SortTracker.restore(first.snapshot)
    val tail = (17 until 40).map(f => resumed.update(dets(f)).toSeq)
    // exact equality, doubles included: restore is bit-faithful
    assert(tail == expected.drop(17))
    // and the restored tracker keeps evolving independently of the donor
    assert(SortTracker.restore(first.snapshot).update(dets(17)).toSeq == expected(17))
  }

  test("two well-separated objects get distinct persistent ids") {
    val t = new SortTracker()
    val perFrame = (0 until 15).map { f =>
      t.update(Array(box(100 + 2.0 * f, 100), box(800 - 2.0 * f, 500)))
    }
    val confirmed = perFrame.drop(3)
    assert(confirmed.forall(_.length == 2))
    val idsA = confirmed.map(_.map(_.trackId).min).distinct
    val idsB = confirmed.map(_.map(_.trackId).max).distinct
    assert(idsA.length == 1 && idsB.length == 1 && idsA.head != idsB.head)
  }

  test("track dies after max_age frames without detections") {
    val t = new SortTracker(maxAge = 1, minHits = 1)
    for (f <- 0 until 5) t.update(Array(box(100 + 2.0 * f, 100)))
    // object disappears
    assert(t.update(Array.empty).isEmpty)
    assert(t.update(Array.empty).isEmpty)
    // a new object at a far position gets a NEW id; like the reference, a
    // fresh track is emitted from its first *associated update*, not on
    // the creation frame (hit_streak starts at 0 — sort.py:119-120,245)
    assert(t.update(Array(box(900, 600))).isEmpty)
    val out = t.update(Array(box(900, 600)))
    assert(out.length == 1)
    assert(out.head.trackId > 1)
  }

  test("emitted boxes stay close to the detections for smooth motion") {
    val t = new SortTracker()
    var maxErr = 0.0
    for (f <- 0 until 30) {
      val d = box(100 + 4.0 * f, 50 + 1.0 * f)
      t.update(Array(d)).foreach { o =>
        maxErr = math.max(maxErr, math.abs(o.x1 - d.x1) + math.abs(o.y1 - d.y1))
      }
    }
    assert(maxErr < 10.0, s"tracker drifted $maxErr px from detections")
  }

  test("crossing objects: tracker emits two tracks per frame throughout") {
    val t = new SortTracker()
    val counts = (0 until 25).map { f =>
      t.update(Array(box(100 + 10.0 * f, 300), box(350 - 10.0 * f, 300))).length
    }
    assert(counts.drop(3).forall(_ >= 1))
    assert(counts.drop(5).count(_ == 2) >= 15)
  }
}

class ReplaySpec extends AnyFunSuite {
  import graft.control._

  private val profiles = IndexedSeq(
    Profile(0, 0, 1.9, 0.0, 100), Profile(1, 0, 1.4, 4.0, 100), Profile(2, 0, 1.0, 8.0, 100),
    Profile(3, 1, 1.5, 0.0, 80), Profile(4, 1, 1.1, 3.0, 80), Profile(5, 1, 0.8, 6.0, 80),
    Profile(6, 2, 1.2, 0.0, 60), Profile(7, 2, 0.9, 2.0, 60), Profile(8, 2, 0.7, 4.0, 60))
  private val centers = Array(
    Array(0.20, 0.25, 0.15), Array(0.50, 0.55, 0.45), Array(0.80, 0.85, 0.75))

  private def mkSwitcher() = {
    val buffer = new SimBuffer(400.0, profiles.map(p => p.knobConfig -> p.sizeBytes).toMap)
    val planner = new KnobPlanner(centers, Array(1.9, 1.5, 1.2), 24.0, 2.0)
    new Switcher(centers, profiles, planner, 500, 24 * 3600 * 2 + 100.0,
      Array(0.86, 0.053, 0.086), buffer)
  }

  private def chunks(n: Int): Iterator[(Long, Array[Double])] = {
    // regime-switching scores: low → high → mid quality
    (0 until n).iterator.map { i =>
      val base = if (i < n / 3) 0.2 else if (i < 2 * n / 3) 0.8 else 0.5
      (i.toLong, Array(base, base * 0.8 + 0.1, base * 0.5))
    }
  }

  test("replay is deterministic and emits one decision per chunk") {
    val a = Replay.skyscraper(chunks(300), mkSwitcher()).toSeq
    val b = Replay.skyscraper(chunks(300), mkSwitcher()).toSeq
    assert(a == b)
    assert(a.length == 300)
    assert(a.head == Replay.LogRow(0, 0, 0, 0.0, 0.0, 0.2))
  }

  test("chosen configs come from the profile table and scores match the chosen column") {
    val log = Replay.skyscraper(chunks(300), mkSwitcher()).toSeq.drop(1)
    assert(log.forall(r => r.chosenConfig >= 0 && r.chosenConfig <= 2))
    assert(log.forall(r => profiles.exists(p =>
      p.placementId == r.chosenPlacement && p.knobConfig == r.chosenConfig &&
        p.runtime == r.runtimeS && p.cloudCost == r.cloudCost)))
  }

  test("buffer admission: runtimes above capacity are never chosen consecutively") {
    // time_cap = 400/(100/2) = 8s; all profiles fit individually, but the
    // buffer drains 2s/tick so sustained >2s runtimes would overflow —
    // admission must bound occupancy
    val buffer = new SimBuffer(400.0, profiles.map(p => p.knobConfig -> p.sizeBytes).toMap)
    val planner = new KnobPlanner(centers, Array(1.9, 1.5, 1.2), 24.0, 2.0)
    val sw = new Switcher(centers, profiles, planner, 500, 24 * 3600 * 2 + 100.0,
      Array(0.86, 0.053, 0.086), buffer)
    Replay.skyscraper(chunks(500), sw).foreach { _ =>
      assert(buffer.occupiedTime <= 8.0 + 1e-9,
        s"buffer exceeded time capacity: ${buffer.occupiedTime}")
    }
  }

  test("static replay sums the chosen column") {
    val log = Replay.static(chunks(100), config = 1, knobRt = 1.5).toSeq
    assert(log.length == 100)
    assert(log.forall(_.runtimeS == 1.5))
    val expected = chunks(100).map(_._2(1)).sum
    assert(math.abs(log.map(_.score).sum - expected) < 1e-9)
  }

  test("skyscraper replay matches the committed golden decision log") {
    val buffer = new SimBuffer(400.0, profiles.map(p => p.knobConfig -> p.sizeBytes).toMap)
    val planner = new KnobPlanner(centers, Array(1.9, 1.5, 1.2), 24.0, 2.0)
    val sw = new Switcher(centers, profiles, planner, 500, 24 * 3600 * 2 + 100.0,
      Array(0.86, 0.053, 0.086), buffer)
    val cs = (0 until 400).iterator.map { i =>
      val base = if (i < 133) 0.2 else if (i < 266) 0.8 else 0.5
      (i.toLong, Array(base, base * 0.8 + 0.1, base * 0.5))
    }
    val got = Replay.skyscraper(cs, sw).map(l =>
      f"${l.chunkId},${l.chosenConfig},${l.chosenPlacement},${l.cloudCost},${l.runtimeS}%.2f,${l.score}%.4f").toSeq
    val golden = scala.io.Source.fromResource("golden_skyscraper_log.csv")
      .getLines().drop(1).toSeq
    assert(got.length == golden.length)
    got.zip(golden).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"golden drift at chunk $i: got '$g' expected '$e'")
    }
  }

  test("LP plan satisfies its constraints") {
    val planner = new KnobPlanner(centers, Array(1.9, 1.5, 1.2), 24.0, 2.0)
    val mixture = Array(0.86, 0.053, 0.086)
    val budget = 24 * 3600 * 2 + 100.0
    val (plan, score) = planner.plan(mixture, budget)
    // each category's ratios sum to 1
    plan.foreach(row => assert(math.abs(row.sum - 1.0) < 1e-6))
    // all ratios within [0, 1]
    assert(plan.flatten.forall(x => x >= -1e-9 && x <= 1 + 1e-9))
    // budget respected
    val cost = (for (i <- plan.indices; j <- plan(i).indices)
      yield mixture(i) * Array(1.9, 1.5, 1.2)(j) * 24 * 3600 * plan(i)(j)).sum
    assert(cost <= budget + 1e-6)
    // beats the all-cheapest-config plan's quality
    val cheapQuality = (for (i <- centers.indices)
      yield mixture(i) * centers(i)(2) * 24 * 3600 / 2.0).sum
    assert(score >= cheapQuality - 1e-6)
  }
}
