package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** e17 semantics on constructed geometry: the positive is the
  * highest-cosine match ≥ threshold (smaller id on exact ties), the
  * hard negative is the highest cosine BELOW the threshold (not just
  * any non-match), and an anchor with no positive yields no triple.
  */
class ContrastiveSpec extends SparkSpec {

  test("contrastivePairs picks argmax positive, hardest negative, drops pairless anchors") {
    val s = spark
    import s.implicits._
    val dim = 64
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](dim)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    val rows = Seq(
      (0L, vec(0 -> 1f)),            // anchor A
      (5L, vec(2 -> 1f)),            // anchor B — no candidate ≥ 0.3 ⇒ dropped
      (10L, vec(0 -> 1f)),           // identical to A: rel 1e6, the positive
      (11L, vec(0 -> 1f)),           // identical tie — larger id loses
      (12L, vec(1 -> 1f)),           // orthogonal: rel 0
      (13L, vec(0 -> 0.2f, 1 -> 1f)) // cos ≈ 0.196: the HARD negative
    ).toDF("vec_id", "embedding")

    val out = Similarity
      .contrastivePairs(rows, col("vec_id") < 10, relThreshold = 300000L)
      .orderBy("anchor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // expected hard-negative rel, derived by the same integer-quantized
    // arithmetic (floor(x*1000) coords, integer dot, double norms)
    val negRel = math.floor(200000.0 /
      (math.sqrt(1040000.0) * math.sqrt(1000000.0)) * 1e6).toLong
    assert(out.toSeq === Seq((0L, 10L, 1000000L, 13L, negRel)))
  }
}
