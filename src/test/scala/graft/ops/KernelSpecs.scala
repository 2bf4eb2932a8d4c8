package graft.ops

import breeze.linalg.DenseVector
import org.scalatest.funsuite.AnyFunSuite

class KalmanSpec extends AnyFunSuite {

  test("bbox<->z conversion round-trips") {
    val (x1, y1, x2, y2) = (100.0, 50.0, 180.0, 210.0)
    val z = Kalman7.bboxToZ(x1, y1, x2, y2)
    val x = DenseVector.zeros[Double](7)
    x(0 until 4) := z
    val (rx1, ry1, rx2, ry2) = Kalman7.xToBbox(x)
    assert(math.abs(rx1 - x1) < 1e-9 && math.abs(ry1 - y1) < 1e-9)
    assert(math.abs(rx2 - x2) < 1e-9 && math.abs(ry2 - y2) < 1e-9)
  }

  test("predict advances by velocity; update pulls toward measurement") {
    val kf = Kalman7.fromBbox(0, 0, 10, 10)
    // one update with a shifted box gives positive x-velocity
    kf.predict()
    kf.update(Kalman7.bboxToZ(2, 0, 12, 10))
    kf.predict()
    val (bx1, _, _, _) = Kalman7.xToBbox(kf.x)
    assert(bx1 > 1.0, s"expected motion carried forward, got x1=$bx1")
    // covariance stays symmetric positive-ish
    assert(breeze.linalg.max(breeze.numerics.abs(kf.P - kf.P.t)) < 1e-6)
  }

  test("stationary box converges to the measurement") {
    val kf = Kalman7.fromBbox(50, 50, 100, 100)
    for (_ <- 0 until 20) {
      kf.predict()
      kf.update(Kalman7.bboxToZ(50, 50, 100, 100))
    }
    val (x1, y1, x2, y2) = Kalman7.xToBbox(kf.x)
    assert(math.abs(x1 - 50) < 0.5 && math.abs(y1 - 50) < 0.5)
    assert(math.abs(x2 - 100) < 0.5 && math.abs(y2 - 100) < 0.5)
  }
}

class HungarianSpec extends AnyFunSuite {

  test("matches brute force on 200 random small matrices") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val n = 1 + rnd.nextInt(5)
      val m = 1 + rnd.nextInt(5)
      val cost = Array.tabulate(n, m)((_, _) => rnd.nextDouble() * 20 - 10)
      val assign = Hungarian.solve(cost)
      // pad-aware total: unassigned rows contribute 0 (dummy)
      val total = assign.zipWithIndex.collect { case (j, i) if j >= 0 => cost(i)(j) }.sum
      val best = Hungarian.bruteForce(cost)
      assert(math.abs(total - best) < 1e-9, s"got $total, brute force $best (${n}x$m)")
    }
  }

  test("assignment is a partial permutation") {
    val cost = Array.tabulate(6, 4)((i, j) => ((i * 7 + j * 3) % 11).toDouble - 5)
    val assign = Hungarian.solve(cost)
    val used = assign.filter(_ >= 0)
    assert(used.distinct.length == used.length)
    assert(used.length == math.min(6, 4))
  }

  test("identity-friendly matrix picks the diagonal") {
    val cost = Array.tabulate(3, 3)((i, j) => if (i == j) -1.0 else 0.0)
    assert(Hungarian.solve(cost).toSeq == Seq(0, 1, 2))
  }
}

class TaskSimSpec extends AnyFunSuite {

  // goldens captured from the reference implementation:
  // python3 execution_utils.py / TaskGraph().detect_to_track(...)
  test("detect_to_track goldens match the reference simulator") {
    assert(TaskSim.detectToTrack(60, 120).simulateRt(4) == 32110.5)
    assert(TaskSim.detectToTrack(30, 120).simulateRt(4) == 17511.0)
    assert(TaskSim.detectToTrack(60, 120).simulateRt(8) == 31625.25)
    assert(TaskSim.detectToTrack(10, 60).simulateRt(2) == 21393.0)
    assert(TaskSim.detectToTrack(60, 120).simulateRt(16) == 31382.625)
    assert(TaskSim.detectToTrack(60, 120).simulateCost == 0.0)
  }

  test("cloud-mixed golden (every 3rd task on cloud, 100KB/50KB transfers)") {
    val base = TaskSim.detectToTrack(60, 120)
    val g = base.copy(tasks = base.tasks.zipWithIndex.map { case (t, i) =>
      t.copy(placement = if (i % 3 == 0) 1 else 0, inBytes = 100000, outBytes = 50000)
    })
    assert(g.simulateRt(4) == 36964.0)
    assert(g.simulateCost == 21481.0)
  }

  test("makespan >= critical path >= longest task") {
    val g = TaskSim.detectToTrack(30, 120)
    val rt = g.simulateRt(4)
    val critical = 721.0 + 519.0 // detector + one dependent tracker
    assert(rt >= critical)
    assert(rt >= g.tasks.map(_.rtSingle).max)
  }

  test("more cores never slows down a pure on-prem graph") {
    val g = TaskSim.covidGraph(5, 10, 60)
    val rts = Seq(2, 4, 8, 16).map(g.simulateRt)
    assert(rts == rts.sorted.reverse)
  }

  test("normalization divides runtimes and roundtrip") {
    val g = TaskSim.detectToTrack(60, 120).normalized(1010.0)
    assert(math.abs(g.tasks.head.rtSingle - 721.0 / 1010.0) < 1e-12)
    assert(math.abs(g.cloudRoundtrip - 160.0 / 1010.0) < 1e-12)
  }
}

class SimplexSpec extends AnyFunSuite {

  test("solves a known LP (max 3x+2y s.t. x+y<=4, x<=2)") {
    val res = Simplex.minimize(
      c = Array(-3.0, -2.0),
      a = Array(Array(1.0, 1.0), Array(1.0, 0.0)),
      b = Array(4.0, 2.0))
    assert(math.abs(res.objective - (-10.0)) < 1e-9) // x=2, y=2
    assert(math.abs(res.x(0) - 2.0) < 1e-9 && math.abs(res.x(1) - 2.0) < 1e-9)
  }

  test("handles >= rows via negative b (x >= 1 as -x <= -1)") {
    val res = Simplex.minimize(
      c = Array(1.0),
      a = Array(Array(-1.0), Array(1.0)),
      b = Array(-1.0, 3.0))
    assert(math.abs(res.x(0) - 1.0) < 1e-9)
  }

  test("reports infeasibility like the reference planner") {
    val ex = intercept[IllegalArgumentException] {
      Simplex.minimize(
        c = Array(0.0),
        a = Array(Array(1.0), Array(-1.0)),
        b = Array(1.0, -2.0)) // x <= 1 and x >= 2
    }
    assert(ex.getMessage.contains("infeasible"))
  }
}
