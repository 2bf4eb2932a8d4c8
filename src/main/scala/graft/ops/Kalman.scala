package graft.ops

import breeze.linalg.{inv, DenseMatrix, DenseVector}

/** Constant-velocity Kalman filter over bbox observations — the SORT
  * tracker's motion model (reference: sort.py:94-151, filterpy setup).
  *
  * State x = [cx, cy, s, r, vx, vy, vs] (center, area, aspect + velocities);
  * observation z = [cx, cy, s, r]. Matrix constants follow the SORT paper's
  * tuning: measurement noise inflated 10x on (s, r), initial velocity
  * variance 1000x, process noise damped 100x on velocities.
  *
  * Pure, driver-free Scala — runs inside executor state (one instance per
  * live track inside flatMapGroups[WithState]); no Spark types here.
  */
final class Kalman7 private (var x: DenseVector[Double], var P: DenseMatrix[Double])
    extends Serializable {
  import Kalman7._

  /** x ← Fx, P ← FPFᵀ + Q. */
  def predict(): Unit = {
    x = F * x
    P = F * P * F.t + Q
  }

  /** Standard KF update with Joseph-form covariance (numerically stable —
    * matches filterpy's default used by the reference).
    */
  def update(z: DenseVector[Double]): Unit = {
    val y = z - H * x
    val S = H * P * H.t + R
    val k = P * H.t * inv(S)
    x = x + k * y
    val ikh = DenseMatrix.eye[Double](7) - k * H
    P = ikh * P * ikh.t + k * R * k.t
  }

  /** Flat state snapshot (x: 7, P: 49 column-major) — the compact
    * streaming-state form; restore via [[Kalman7.restore]] is exact
    * (same doubles, bit for bit).
    */
  private[ops] def snapshotX: Array[Double] = x.toArray
  private[ops] def snapshotP: Array[Double] = P.copy.data
}

object Kalman7 {
  /** Bbox [x1,y1,x2,y2] → observation [cx, cy, area, aspect]
    * (convert_bbox_to_z, sort.py:66-78).
    */
  def bboxToZ(x1: Double, y1: Double, x2: Double, y2: Double): DenseVector[Double] = {
    val w = x2 - x1; val h = y2 - y1
    DenseVector(x1 + w / 2.0, y1 + h / 2.0, w * h, w / h)
  }

  /** State → bbox [x1,y1,x2,y2] (convert_x_to_bbox, sort.py:81-91). */
  def xToBbox(x: DenseVector[Double]): (Double, Double, Double, Double) = {
    val w = math.sqrt(x(2) * x(3))
    val h = x(2) / w
    (x(0) - w / 2.0, x(1) - h / 2.0, x(0) + w / 2.0, x(1) + h / 2.0)
  }

  private val F: DenseMatrix[Double] = {
    val m = DenseMatrix.eye[Double](7)
    m(0, 4) = 1.0; m(1, 5) = 1.0; m(2, 6) = 1.0
    m
  }
  private val H: DenseMatrix[Double] = {
    val m = DenseMatrix.zeros[Double](4, 7)
    (0 until 4).foreach(i => m(i, i) = 1.0)
    m
  }
  private val R: DenseMatrix[Double] =
    breeze.linalg.diag(DenseVector(1.0, 1.0, 10.0, 10.0))
  private val Q: DenseMatrix[Double] =
    breeze.linalg.diag(DenseVector(1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 0.0001))

  /** New filter initialised from a first bbox observation. */
  def fromBbox(x1: Double, y1: Double, x2: Double, y2: Double): Kalman7 = {
    val x0 = DenseVector.zeros[Double](7)
    x0(0 until 4) := bboxToZ(x1, y1, x2, y2)
    val p0 = breeze.linalg.diag(DenseVector(10.0, 10.0, 10.0, 10.0, 10000.0, 10000.0, 10000.0))
    new Kalman7(x0, p0)
  }

  /** Rebuild a filter from a flat snapshot (exact inverse of
    * snapshotX/snapshotP).
    */
  private[ops] def restore(x: Array[Double], p: Array[Double]): Kalman7 = {
    require(x.length == 7 && p.length == 49, "bad Kalman7 snapshot shape")
    new Kalman7(DenseVector(x.clone()), new DenseMatrix(7, 7, p.clone()))
  }
}
