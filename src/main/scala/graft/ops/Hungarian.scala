package graft.ops

/** Min-cost bipartite assignment (Hungarian algorithm with potentials,
  * O(n²m)) — the SORT association step's LAP solver (reference:
  * sort.py:36-44, lap.lapjv / scipy.linear_sum_assignment).
  *
  * Rectangular matrices are padded to square with zero-cost dummy cells;
  * with non-positive real costs (SORT passes -IoU ≤ 0) the restriction of
  * the optimum to real cells equals scipy's maximal-matching optimum.
  *
  * Pure Scala: runs per-group inside flatMapGroups — sequential within a
  * frame, parallel across frames/streams, which is the scale axis (a frame
  * has tens of boxes; a day of video has millions of frames).
  */
object Hungarian {

  /** Returns, for each row of `cost`, the assigned column (or -1 for
    * padded/unassigned rows). Minimizes total cost over a perfect matching
    * of the padded square matrix.
    */
  def solve(cost: Array[Array[Double]]): Array[Int] = {
    val nRows = cost.length
    if (nRows == 0) return Array.empty
    val nCols = cost(0).length
    if (nCols == 0) return Array.fill(nRows)(-1)
    val n = math.max(nRows, nCols)

    // a(i)(j): padded square matrix
    val a = Array.tabulate(n, n)((i, j) => if (i < nRows && j < nCols) cost(i)(j) else 0.0)

    // potentials + matching, 1-indexed (classic shortest-augmenting-path)
    val u = new Array[Double](n + 1)
    val v = new Array[Double](n + 1)
    val p = new Array[Int](n + 1) // p(j) = row matched to column j
    val way = new Array[Int](n + 1)

    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(Double.PositiveInfinity)
      val used = new Array[Boolean](n + 1)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.PositiveInfinity
        var j1 = -1
        var j = 1
        while (j <= n) {
          if (!used(j)) {
            val cur = a(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        if (p(j0) == 0) done = true
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
      i += 1
    }

    val result = Array.fill(nRows)(-1)
    var j = 1
    while (j <= n) {
      if (p(j) >= 1 && p(j) <= nRows && j <= nCols) result(p(j) - 1) = j - 1
      j += 1
    }
    result
  }

  /** Brute-force reference for specs (≤ ~8x8): tries all permutations. */
  def bruteForce(cost: Array[Array[Double]]): Double = {
    val nRows = cost.length
    val nCols = cost(0).length
    val n = math.max(nRows, nCols)
    val a = Array.tabulate(n, n)((i, j) => if (i < nRows && j < nCols) cost(i)(j) else 0.0)
    (0 until n).permutations.map(per => per.zipWithIndex.map { case (j, i) => a(i)(j) }.sum).min
  }
}
