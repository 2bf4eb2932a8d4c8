package graft.ops

/** Dense two-phase simplex for small LPs:
  *   minimize c·x  subject to  A x ≤ b,  x ≥ 0
  * (negative b entries allowed — handled via artificials in phase 1).
  *
  * This is the knob-planner's solver (reference: knob_plan.py:72-133 uses
  * scipy.linprog). Problem sizes are |categories|·|placements| ≤ a few
  * hundred variables (paper §5.5 Fig. 13), so a dense driver-side tableau
  * is the right tool — no distribution needed; Bland's rule guards cycling.
  */
object Simplex {

  final case class Result(x: Array[Double], objective: Double)

  /** @throws IllegalArgumentException if infeasible (the reference raises
    *         the same condition — knob_plan.py:116-118).
    */
  def minimize(c: Array[Double], a: Array[Array[Double]], b: Array[Double]): Result = {
    val m = a.length
    val n = c.length
    require(b.length == m && a.forall(_.length == n))

    // normalize rows to b >= 0; >= rows (after flip) get surplus+artificial
    val rowSign = b.map(bi => if (bi < 0) -1.0 else 1.0)
    val needArt = rowSign.map(_ < 0)
    val nArt = needArt.count(identity)
    val cols = n + m + nArt // vars + slack/surplus + artificials
    val t = Array.ofDim[Double](m + 1, cols + 1)
    val basis = new Array[Int](m)

    var artIdx = 0
    for (i <- 0 until m) {
      for (j <- 0 until n) t(i)(j) = rowSign(i) * a(i)(j)
      t(i)(n + i) = rowSign(i) // slack (+1) or surplus (-1)
      t(i)(cols) = rowSign(i) * b(i)
      if (needArt(i)) {
        t(i)(n + m + artIdx) = 1.0
        basis(i) = n + m + artIdx
        artIdx += 1
      } else basis(i) = n + i
    }

    def pivot(row: Int, col: Int): Unit = {
      val p = t(row)(col)
      var j = 0
      while (j <= cols) { t(row)(j) /= p; j += 1 }
      var i = 0
      while (i <= m) {
        if (i != row && t(i)(col) != 0.0) {
          val f = t(i)(col)
          var k = 0
          while (k <= cols) { t(i)(k) -= f * t(row)(k); k += 1 }
        }
        i += 1
      }
      if (row < m) basis(row) = col
    }

    /** Runs simplex iterations on objective row m; `active` limits eligible
      * entering columns. Bland's rule.
      */
    def iterate(active: Int => Boolean): Unit = {
      var guard = 0
      var continue = true
      while (continue && guard < 100000) {
        guard += 1
        // entering: first active column with negative reduced cost
        var col = -1
        var j = 0
        while (col < 0 && j < cols) {
          if (active(j) && t(m)(j) < -1e-9) col = j
          j += 1
        }
        if (col < 0) continue = false
        else {
          // leaving: min ratio, Bland tie-break on basis index
          var row = -1
          var best = Double.PositiveInfinity
          var i = 0
          while (i < m) {
            if (t(i)(col) > 1e-9) {
              val ratio = t(i)(cols) / t(i)(col)
              if (ratio < best - 1e-12 ||
                  (math.abs(ratio - best) <= 1e-12 && (row < 0 || basis(i) < basis(row)))) {
                best = ratio; row = i
              }
            }
            i += 1
          }
          require(row >= 0, "LP unbounded")
          pivot(row, col)
        }
      }
      require(guard < 100000, "simplex failed to converge")
    }

    if (nArt > 0) {
      // phase 1: minimize sum of artificials — reduced-cost row is
      // c1(j) - Σ_{artificial-basic rows} t(i)(j), with c1 = 1 on
      // artificial columns (keeps basic columns at reduced cost 0)
      for (j <- 0 to cols) {
        var s = 0.0
        for (i <- 0 until m if basis(i) >= n + m) s += t(i)(j)
        t(m)(j) = (if (j >= n + m && j < cols) 1.0 else 0.0) - s
      }
      iterate(_ => true)
      require(math.abs(t(m)(cols)) < 1e-7,
        "[Knob planner error] Linear program is infeasible, please adjust the configuration (e.g. increase budget or num_cores).")
      // drive remaining artificials out of the basis if possible
      for (i <- 0 until m if basis(i) >= n + m) {
        var j = 0
        var found = -1
        while (found < 0 && j < n + m) {
          if (math.abs(t(i)(j)) > 1e-9) found = j
          j += 1
        }
        if (found >= 0) pivot(i, found)
      }
    }

    // phase 2 objective row (in terms of non-basic vars)
    for (j <- 0 to cols) t(m)(j) = 0.0
    for (j <- 0 until n) t(m)(j) = c(j)
    for (i <- 0 until m if basis(i) < n) {
      val cb = c(basis(i))
      if (cb != 0.0) {
        var j = 0
        while (j <= cols) { t(m)(j) -= cb * t(i)(j); j += 1 }
      }
    }
    iterate(j => j < n + m) // artificials stay out

    val x = new Array[Double](n)
    for (i <- 0 until m if basis(i) < n) x(basis(i)) = t(i)(cols)
    Result(x, c.zip(x).map { case (ci, xi) => ci * xi }.sum)
  }
}
