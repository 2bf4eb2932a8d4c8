package graft.ops

import breeze.linalg.{svd, DenseMatrix, DenseVector}

/** Direct linear transform camera calibration (reference:
  * calibrate_camera.py:22-142): estimate the 3x4 projection matrix P from
  * ≥6 world↔pixel correspondences via normalized DLT + SVD.
  *
  * Offline one-shot on the driver (Breeze SVD); the resulting matrix is a
  * broadcast literal consumed by the homogeneous-projection operator (P9,
  * a07_projection).
  */
object Dlt {

  /** Normalization: translate centroid to origin, scale mean distance to
    * sqrt(2) (sqrt(3) in 3D) — the standard Hartley conditioning step.
    */
  private def normalize(pts: Seq[DenseVector[Double]]): (DenseMatrix[Double], Seq[DenseVector[Double]]) = {
    val dim = pts.head.length
    val mean = pts.reduce(_ + _) / pts.length.toDouble
    val meanDist = pts.map(p => breeze.linalg.norm(p - mean)).sum / pts.length
    val scale = math.sqrt(dim.toDouble) / meanDist
    val t = DenseMatrix.eye[Double](dim + 1)
    for (i <- 0 until dim) {
      t(i, i) = scale
      t(i, dim) = -scale * mean(i)
    }
    (t, pts.map(p => p * scale - mean * scale))
  }

  /** Estimate P (3x4) from world (3D) and pixel (2D) correspondences.
    * Returns (P, mean reprojection error in pixels).
    */
  def calibrate(world: Seq[(Double, Double, Double)], pixel: Seq[(Double, Double)]): (DenseMatrix[Double], Double) = {
    require(world.length == pixel.length && world.length >= 6, "need >= 6 correspondences")
    val w = world.map { case (x, y, z) => DenseVector(x, y, z) }
    val p = pixel.map { case (u, v) => DenseVector(u, v) }
    val (tw, wn) = normalize(w)
    val (tp, pn) = normalize(p)

    // build the 2n x 12 system
    val a = DenseMatrix.zeros[Double](2 * world.length, 12)
    for (i <- world.indices) {
      val (x, y, z) = (wn(i)(0), wn(i)(1), wn(i)(2))
      val (u, v) = (pn(i)(0), pn(i)(1))
      a(2 * i, ::) := DenseVector(x, y, z, 1, 0, 0, 0, 0, -u * x, -u * y, -u * z, -u).t
      a(2 * i + 1, ::) := DenseVector(0, 0, 0, 0, x, y, z, 1, -v * x, -v * y, -v * z, -v).t
    }

    // last right-singular vector = least-squares null vector
    val s = svd(a)
    val h = s.Vt(s.Vt.rows - 1, ::).t
    val pNorm = new DenseMatrix(4, 3, h.toArray).t // row-major reshape 3x4

    // denormalize: P = Tp^-1 * Pn * Tw
    val pm = breeze.linalg.inv(tp) * pNorm * tw
    val pScaled = pm / pm(2, 3)

    // mean reprojection error
    val errs = world.indices.map { i =>
      val wh = DenseVector(world(i)._1, world(i)._2, world(i)._3, 1.0)
      val proj = pScaled * wh
      val (u, v) = (proj(0) / proj(2), proj(1) / proj(2))
      math.hypot(u - pixel(i)._1, v - pixel(i)._2)
    }
    (pScaled, errs.sum / errs.length)
  }
}
