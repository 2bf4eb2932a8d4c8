package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class KalmanSpec extends AnyFunSuite {

  test("bbox<->z conversion round-trips") {
    val (x1, y1, x2, y2) = (100.0, 50.0, 180.0, 210.0)
    val z = Kalman7.bboxToZ(x1, y1, x2, y2)
    val x = new Array[Double](7)
    System.arraycopy(z, 0, x, 0, 4)
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
    val asym = (for (i <- 0 until 7; j <- 0 until 7)
      yield math.abs(kf.P(i * 7 + j) - kf.P(j * 7 + i))).max
    assert(asym < 1e-6)
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

  test("explicit-arithmetic filter matches an independent breeze/LAPACK " +
    "implementation over a noisy 100-frame trajectory") {
    import breeze.linalg.{inv, DenseMatrix, DenseVector}
    // independent reference: same model, library linear algebra
    val F = { val m = DenseMatrix.eye[Double](7); m(0, 4) = 1.0; m(1, 5) = 1.0; m(2, 6) = 1.0; m }
    val H = { val m = DenseMatrix.zeros[Double](4, 7); (0 until 4).foreach(i => m(i, i) = 1.0); m }
    val R = breeze.linalg.diag(DenseVector(1.0, 1.0, 10.0, 10.0))
    val Qm = breeze.linalg.diag(DenseVector(1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 0.0001))
    var bx = DenseVector.zeros[Double](7)
    var bP = breeze.linalg.diag(DenseVector(10.0, 10.0, 10.0, 10.0, 10000.0, 10000.0, 10000.0))
    val z0 = Kalman7.bboxToZ(40, 60, 100, 140)
    bx(0 until 4) := DenseVector(z0)
    val kf = Kalman7.fromBbox(40, 60, 100, 140)
    val rnd = new scala.util.Random(7)
    for (f <- 1 to 100) {
      bx = F * bx; bP = F * bP * F.t + Qm
      kf.predict()
      val z = Kalman7.bboxToZ(
        40 + 2.0 * f + rnd.nextGaussian(), 60 + 1.5 * f + rnd.nextGaussian(),
        100 + 2.0 * f + rnd.nextGaussian(), 140 + 1.5 * f + rnd.nextGaussian())
      val zv = DenseVector(z)
      val yv = zv - H * bx
      val S = H * bP * H.t + R
      val K = bP * H.t * inv(S)
      bx = bx + K * yv
      val ikh = DenseMatrix.eye[Double](7) - K * H
      bP = ikh * bP * ikh.t + K * R * K.t
      kf.update(z)
      for (i <- 0 until 7) {
        assert(math.abs(kf.x(i) - bx(i)) <= 1e-9 * math.max(1.0, math.abs(bx(i))),
          s"frame $f state dim $i: ${kf.x(i)} vs breeze ${bx(i)}")
        for (j <- 0 until 7)
          assert(math.abs(kf.P(i * 7 + j) - bP(i, j)) <= 1e-9 * math.max(1.0, math.abs(bP(i, j))),
            s"frame $f P($i,$j): ${kf.P(i * 7 + j)} vs breeze ${bP(i, j)}")
      }
    }
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

  test("matches brute-force vertex enumeration on 100 random small LPs") {
    // min c·x, Ax <= b, x >= 0: optimum (if bounded+feasible) is at a
    // vertex — intersect every subset of n active constraints from
    // {rows of A} ∪ {x_i = 0} and take the feasible minimum
    val rnd = new scala.util.Random(17)
    var checked = 0
    for (_ <- 0 until 100) {
      val n = 2
      val m = 3
      val a = Array.fill(m, n)(rnd.nextDouble() * 4 - 1)
      val b = Array.fill(m)(rnd.nextDouble() * 5 + 0.5) // b > 0 => feasible at 0
      val c = Array.fill(n)(rnd.nextDouble() * 4 - 2)

      // brute force: all pairs of constraints (rows + axes) as equalities
      val rows: Seq[(Array[Double], Double)] =
        a.zip(b).map { case (r, bi) => (r, bi) }.toSeq ++
          (0 until n).map(i => (Array.tabulate(n)(j => if (i == j) 1.0 else 0.0), 0.0))
      val vertices = for {
        i <- rows.indices; j <- rows.indices if i < j
        det = rows(i)._1(0) * rows(j)._1(1) - rows(i)._1(1) * rows(j)._1(0)
        if math.abs(det) > 1e-9
      } yield {
        val x0 = (rows(i)._2 * rows(j)._1(1) - rows(j)._2 * rows(i)._1(1)) / det
        val x1 = (rows(i)._1(0) * rows(j)._2 - rows(j)._1(0) * rows(i)._2) / det
        Array(x0, x1)
      }
      val feasible = vertices.filter(v =>
        v.forall(_ >= -1e-9) &&
          a.zip(b).forall { case (r, bi) => r(0) * v(0) + r(1) * v(1) <= bi + 1e-9 })
      val objs = feasible.map(v => c(0) * v(0) + c(1) * v(1))
      // unbounded iff an improving ray exists; skip those cases by
      // requiring the simplex itself not to throw AND a vertex optimum
      if (objs.nonEmpty) {
        val best = objs.min
        try {
          val res = Simplex.minimize(c, a, b)
          assert(res.objective <= best + 1e-7,
            s"simplex ${res.objective} worse than vertex best $best")
          if (res.objective < best - 1e-7) {
            // simplex found better than any vertex => problem unbounded;
            // acceptable only if some direction improves without bound
          } else checked += 1
        } catch {
          case e: IllegalArgumentException if e.getMessage.contains("unbounded") => ()
        }
      }
    }
    assert(checked >= 50, s"only $checked bounded LPs validated")
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

class KnobPlannerSpec extends AnyFunSuite {
  import graft.control.KnobPlanner

  test("knapsack plan is one-hot, within budget, and never beats the LP relaxation") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 50) {
      val nc = 2 + rnd.nextInt(3) // categories
      val np = 2 + rnd.nextInt(3) // configs
      val categories = Array.fill(nc, np)(math.rint(rnd.nextDouble() * 100) / 100)
      val knobCost = Array.fill(np)(0.5 + math.rint(rnd.nextDouble() * 150) / 100)
      val horizon = 24.0
      val planner = new KnobPlanner(categories, knobCost, horizon, 2.0)
      val mixRaw = Array.fill(nc)(0.05 + rnd.nextDouble())
      val mixture = mixRaw.map(_ / mixRaw.sum)
      // budget between the cheapest-everywhere and the priciest-everywhere plan
      val minCost = mixture.sum * knobCost.min * horizon * 3600
      val maxCost = mixture.sum * knobCost.max * horizon * 3600
      val budget = minCost + rnd.nextDouble() * (maxCost - minCost) * 1.2
      val (ksPlan, ksScore) = planner.assignKnobsKnapsack(mixture, budget)
      // one-hot rows
      ksPlan.foreach { row =>
        assert(row.count(_ == 1.0) == 1 && row.forall(v => v == 0.0 || v == 1.0))
      }
      // within budget
      val spent = (0 until nc).map { i =>
        val j = ksPlan(i).indexOf(1.0)
        mixture(i) * knobCost(j) * horizon * 3600
      }.sum
      assert(spent <= budget + 1e-6, s"trial $trial overspent: $spent > $budget")
      // LP relaxation dominates the integral greedy plan
      val (_, lpScore) = planner.assignKnobsLinProg(mixture, budget)
      assert(lpScore >= ksScore - 1e-6,
        s"trial $trial: LP $lpScore below knapsack $ksScore")
    }
  }

  test("knapsack rejects a budget below the cheapest baseline, like the LP") {
    val planner = new KnobPlanner(
      Array(Array(0.2, 0.9), Array(0.7, 0.3)), Array(1.0, 2.0), 24.0, 2.0)
    val ex = intercept[IllegalArgumentException] {
      planner.assignKnobsKnapsack(Array(0.5, 0.5), budget = 1.0)
    }
    assert(ex.getMessage.contains("infeasible"))
  }

  test("knapsack picks each category's best config when the budget is ample") {
    val categories = Array(Array(0.2, 0.9, 0.5), Array(0.7, 0.3, 0.8))
    val knobCost = Array(1.0, 2.0, 3.0)
    val planner = new KnobPlanner(categories, knobCost, 24.0, 2.0)
    val (plan, _) = planner.assignKnobsKnapsack(Array(0.5, 0.5), budget = 1e12)
    assert(plan(0).indexOf(1.0) == 1) // best quality 0.9
    assert(plan(1).indexOf(1.0) == 2) // best quality 0.8
  }

  test("knapsack agrees with the LP on the replay dims (all categories on config 1)") {
    val planner = new KnobPlanner(
      Array(Array(0.20, 0.25, 0.15), Array(0.50, 0.55, 0.45), Array(0.80, 0.85, 0.75)),
      Array(1.9, 1.5, 1.2), 24.0, 2.0)
    val mix = Array(0.86, 0.053, 0.086)
    val mixture = mix.map(_ / mix.sum)
    val budget = 24 * 3600 * 2 + 100.0
    val (ksPlan, ksScore) = planner.assignKnobsKnapsack(mixture, budget)
    val (lpPlan, lpScore) = planner.assignKnobsLinProg(mixture, budget)
    for (i <- 0 until 3) {
      assert(ksPlan(i).indexOf(1.0) == 1)
      assert(math.abs(lpPlan(i)(1) - 1.0) < 1e-9)
    }
    assert(math.abs(ksScore - lpScore) < 1e-6)
  }
}
