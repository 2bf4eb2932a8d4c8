package graft.ops

/** Constant-velocity Kalman filter over bbox observations — the SORT
  * tracker's motion model (reference: sort.py:94-151, filterpy setup).
  *
  * State x = [cx, cy, s, r, vx, vy, vs] (center, area, aspect + velocities);
  * observation z = [cx, cy, s, r]. Matrix constants follow the SORT paper's
  * tuning: measurement noise inflated 10x on (s, r), initial velocity
  * variance 1000x, process noise damped 100x on velocities.
  *
  * Implementation note: the matrix algebra is written out as explicit
  * scalar arithmetic with a FIXED association order (documented per step)
  * instead of going through a linear-algebra library. Two reasons:
  *  - speed: F/H/Q/R are sparse constants, so the dense 7x7 products a
  *    library would run collapse to a handful of adds per entry, with no
  *    per-update matrix allocation or native-call overhead — this runs
  *    once per track per frame inside executor state;
  *  - replayability: the n01/n15 driver gate re-executes this exact
  *    arithmetic as a DuckDB recursive CTE (SortReplayOracle). A library
  *    inverse/multiply (LAPACK LU, dgemm) has an unspecified operation
  *    order, which would make the live oracle only tolerance-close; the
  *    explicit form makes it reproducible to the last bit.
  * The 4x4 innovation inverse uses the adjugate/cofactor formula — exact
  * order, and numerically fine here because S = P[0:4,0:4] + R is well
  * conditioned by construction (R adds 1..10 to the diagonal).
  *
  * Pure, driver-free Scala — runs inside executor state (one instance per
  * live track inside flatMapGroups[WithState]); no Spark types here.
  */
final class Kalman7 private (val x: Array[Double], val P: Array[Double])
    extends Serializable {
  import Kalman7._

  /** x ← Fx, P ← FPFᵀ + Q.
    *
    * With F = I + shift(0..2 ← 4..6): (FPFᵀ)(i,j) =
    * (P(i,j) [+ P(i+4,j) if i<3]) + (P(i,j+4) [+ P(i+4,j+4) if i<3]) if j<3
    * — i.e. a = FP first, then b = aFᵀ, each entry one add; Q last.
    */
  def predict(): Unit = {
    x(0) += x(4); x(1) += x(5); x(2) += x(6)
    val a = new Array[Double](49)
    var i = 0
    while (i < 7) {
      var j = 0
      while (j < 7) {
        a(i * 7 + j) = if (i < 3) P(i * 7 + j) + P((i + 4) * 7 + j) else P(i * 7 + j)
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < 7) {
      var j = 0
      while (j < 7) {
        P(i * 7 + j) = if (j < 3) a(i * 7 + j) + a(i * 7 + j + 4) else a(i * 7 + j)
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < 7) { P(i * 7 + i) += qDiag(i); i += 1 }
  }

  /** Standard KF update with Joseph-form covariance (numerically stable —
    * matches filterpy's default used by the reference). H selects dims
    * 0..3, so S = P[0:4,0:4] + R and K = P[:,0:4]·S⁻¹; every 4-term dot
    * product is associated left-to-right: ((t0 + t1) + t2) + t3.
    */
  def update(z: Array[Double]): Unit = {
    val y = new Array[Double](4)
    var i = 0
    while (i < 4) { y(i) = z(i) - x(i); i += 1 }

    // S = P[0:4,0:4] + R (R diagonal)
    val s = new Array[Double](16)
    i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        s(i * 4 + j) = if (i == j) P(i * 7 + j) + rDiag(i) else P(i * 7 + j)
        j += 1
      }
      i += 1
    }
    val det = det4(s)
    val si = inv4(s, det)

    // K = P[:,0:4] * S^-1  (7x4)
    val k = new Array[Double](28)
    i = 0
    while (i < 7) {
      var j = 0
      while (j < 4) {
        k(i * 4 + j) = ((P(i * 7) * si(j) + P(i * 7 + 1) * si(4 + j)) +
          P(i * 7 + 2) * si(8 + j)) + P(i * 7 + 3) * si(12 + j)
        j += 1
      }
      i += 1
    }

    // x += K y
    i = 0
    while (i < 7) {
      x(i) += ((k(i * 4) * y(0) + k(i * 4 + 1) * y(1)) +
        k(i * 4 + 2) * y(2)) + k(i * 4 + 3) * y(3)
      i += 1
    }

    // Joseph form: P = (I-KH) P (I-KH)ᵀ + K R Kᵀ, with (KH)(i,j) = K(i,j)
    // for j<4 else 0, so M = (I-KH)P subtracts a 4-term dot per entry.
    val m = new Array[Double](49)
    i = 0
    while (i < 7) {
      var j = 0
      while (j < 7) {
        m(i * 7 + j) = P(i * 7 + j) - (((k(i * 4) * P(j) + k(i * 4 + 1) * P(7 + j)) +
          k(i * 4 + 2) * P(14 + j)) + k(i * 4 + 3) * P(21 + j))
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < 7) {
      var j = 0
      while (j < 7) {
        val n = m(i * 7 + j) - (((m(i * 7) * k(j * 4) + m(i * 7 + 1) * k(j * 4 + 1)) +
          m(i * 7 + 2) * k(j * 4 + 2)) + m(i * 7 + 3) * k(j * 4 + 3))
        // + K R Kᵀ with R = diag(1,1,10,10): unit entries multiply bare
        P(i * 7 + j) = n + (((k(i * 4) * k(j * 4) + k(i * 4 + 1) * k(j * 4 + 1)) +
          (k(i * 4 + 2) * 10.0) * k(j * 4 + 2)) + (k(i * 4 + 3) * 10.0) * k(j * 4 + 3))
        j += 1
      }
      i += 1
    }
  }

  /** Flat state snapshot (x: 7, P: 49 row-major; P is symmetric up to
    * float round-off so the layout choice is observationally irrelevant) —
    * the compact streaming-state form; restore via [[Kalman7.restore]] is
    * exact (same doubles, bit for bit).
    */
  private[ops] def snapshotX: Array[Double] = x.clone()
  private[ops] def snapshotP: Array[Double] = P.clone()
}

object Kalman7 {
  /** Bbox [x1,y1,x2,y2] → observation [cx, cy, area, aspect]
    * (convert_bbox_to_z, sort.py:66-78).
    */
  def bboxToZ(x1: Double, y1: Double, x2: Double, y2: Double): Array[Double] = {
    val w = x2 - x1; val h = y2 - y1
    Array(x1 + w / 2.0, y1 + h / 2.0, w * h, w / h)
  }

  /** State → bbox [x1,y1,x2,y2] (convert_x_to_bbox, sort.py:81-91). */
  def xToBbox(x: Array[Double]): (Double, Double, Double, Double) = {
    val w = math.sqrt(x(2) * x(3))
    val h = x(2) / w
    (x(0) - w / 2.0, x(1) - h / 2.0, x(0) + w / 2.0, x(1) + h / 2.0)
  }

  private val qDiag = Array(1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 0.0001)
  private val rDiag = Array(1.0, 1.0, 10.0, 10.0)

  /** 3x3 determinant, fixed association:
    * ((a(ei-fh)) - (b(di-fg))) + (c(dh-eg)).
    */
  @inline private def det3(a: Double, b: Double, c: Double,
                           d: Double, e: Double, f: Double,
                           g: Double, h: Double, iv: Double): Double =
    ((a * (e * iv - f * h)) - (b * (d * iv - f * g))) + (c * (d * h - e * g))

  /** Unsigned 3x3 minor of the 4x4 `s` (row-major), removing row r, col c;
    * remaining rows/cols taken in ascending order.
    */
  private def minor(s: Array[Double], r: Int, c: Int): Double = {
    val rs = Array(0, 1, 2, 3).filter(_ != r)
    val cs = Array(0, 1, 2, 3).filter(_ != c)
    det3(
      s(rs(0) * 4 + cs(0)), s(rs(0) * 4 + cs(1)), s(rs(0) * 4 + cs(2)),
      s(rs(1) * 4 + cs(0)), s(rs(1) * 4 + cs(1)), s(rs(1) * 4 + cs(2)),
      s(rs(2) * 4 + cs(0)), s(rs(2) * 4 + cs(1)), s(rs(2) * 4 + cs(2)))
  }

  /** det via first-row cofactor expansion:
    * ((s00·m00 - s01·m01) + s02·m02) - s03·m03.
    */
  private[ops] def det4(s: Array[Double]): Double =
    ((s(0) * minor(s, 0, 0) - s(1) * minor(s, 0, 1)) +
      s(2) * minor(s, 0, 2)) - s(3) * minor(s, 0, 3)

  /** Adjugate inverse: inv(i,j) = (±minor(j,i)) / det. */
  private[ops] def inv4(s: Array[Double], det: Double): Array[Double] = {
    val out = new Array[Double](16)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        val c = minor(s, j, i)
        out(i * 4 + j) = (if (((i + j) & 1) == 0) c else -c) / det
        j += 1
      }
      i += 1
    }
    out
  }

  /** New filter initialised from a first bbox observation. */
  def fromBbox(x1: Double, y1: Double, x2: Double, y2: Double): Kalman7 = {
    val z = bboxToZ(x1, y1, x2, y2)
    val x0 = new Array[Double](7)
    System.arraycopy(z, 0, x0, 0, 4)
    val p0 = new Array[Double](49)
    val pd = Array(10.0, 10.0, 10.0, 10.0, 10000.0, 10000.0, 10000.0)
    var i = 0
    while (i < 7) { p0(i * 7 + i) = pd(i); i += 1 }
    new Kalman7(x0, p0)
  }

  /** Rebuild a filter from a flat snapshot (exact inverse of
    * snapshotX/snapshotP).
    */
  private[ops] def restore(x: Array[Double], p: Array[Double]): Kalman7 = {
    require(x.length == 7 && p.length == 49, "bad Kalman7 snapshot shape")
    new Kalman7(x.clone(), p.clone())
  }
}
