package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GPT-3-style corpus quality classifier (Brown et al. 2020 §A; the
  * curated-vs-crawl logistic regression every LLM data pipeline runs as
  * its keep/drop gate — the reference's knob-quality scoring applied to
  * text, cf. `/root/reference/code/src/control/knob_tuning.py`'s
  * quality-vs-cost framing).
  *
  * A binary logistic regression over B=1024 hashed-bigram features
  * (md5-prefix buckets, the t27/t18 parity convention), trained with
  * K=64 FULL-BATCH gradient-descent steps. Everything that crosses an
  * engine boundary is integer:
  *
  *   - features: per-doc bigram bucket counts, L2-normalized and
  *     quantized to integer micros x = floor(cnt·1e6/√Σcnt²), plus a
  *     bias feature (bucket B, x = 1e6) on every doc;
  *   - residuals: r = floor((y − σ(z/1e12))·1e6) — ONE double sigmoid
  *     per (doc, step), everything around it exact;
  *   - gradient: g_b = Σ x·r summed as longs inside each partition
  *     (exact by the ≤64k-docs-per-partition sizing: |x·r| ≤ 1e12, so
  *     a partition partial tops out near 2^56) and as BigInt across
  *     partitions (a long cross-partition sum could wrap at 10¹⁰ docs);
  *   - update: w_b += tdiv(η·g_b, N·1e6) with η=8, truncated toward
  *     zero — BigInt driver arithmetic on ≤ B+1 values.
  *
  * Because the whole loop is integer-exact, the DuckDB oracle replays
  * ALL 64 training steps live as a recursive CTE (no frozen weights —
  * unlike n09's MLP, nothing about this model is snapshotted; the t29
  * gate recomputes training end-to-end every run).
  *
  * Execution shape — spark.ml's own LogisticRegression pattern
  * (cached feature matrix + per-partition gradient loop + tree-merged
  * partials), because iterative GD is the textbook case for
  * per-partition imperative logic: the per-element work is a multiply
  * and an array write, and the Column spelling of the same loop
  * (aggregate()/explode over the feature structs) runs interpreted —
  * higher-order functions are CodegenFallback — measured 0.22 s/step
  * vs ~0.02 s/step for the JVM loop at sf0.1. Features are built in
  * ONE narrow pass over documents (bigram counts are row-local — no
  * count shuffle at all), repartitioned to ~64k docs/partition, and
  * persisted once for the 64 passes + scoring (the d08/q46
  * multi-consumer rule; Bench's session reset retires the blocks).
  * Per step the driver ships one 8 KB weight broadcast and receives
  * tree-merged ≤(B+1)-entry partials — nothing scales with N.
  */
object QualityClassifier {

  /** Hash buckets (bias is bucket B ⇒ B+1 weights). */
  val B = 1024
  /** Full-batch GD steps. */
  val Steps = 64
  /** Integer learning rate (η·g // (N·1e6) per step). */
  val Eta = 8L

  /** One document's quantized feature vector (parallel bucket/value
    * arrays; bs sorted ascending, bias bucket B always last).
    */
  private[graft] final case class DocFeat(
      docId: Long, y: Long, bs: Array[Int], xs: Array[Long])

  /** Truncate-toward-zero division (both engines spell it sign-split so
    * no floor-vs-truncate ambiguity ever crosses the oracle boundary).
    */
  private def tdiv(a: BigInt, b: BigInt): BigInt =
    if (a.signum >= 0) a / b else -((-a) / b)

  /** Feature build: one narrow pass over documents — tokenize, hash
    * bigrams to buckets, count, L2-quantize, append the bias — all
    * row-local (a document's bigram counts never leave its row, so
    * unlike the t27/t28 feature paths there is no count shuffle at
    * all). The only exchange is the round-robin repartition that caps
    * partitions at ~64k docs — the bound the long partial-gradient
    * accumulator's exactness is proved against — while keeping enough
    * splits for the loop to parallelize.
    */
  private[graft] def featureRdd(docs: DataFrame, nDocs: Long): RDD[DocFeat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = math.max(nDocs / 65536 + 1,
      math.min(spark.sparkContext.defaultParallelism.toLong, nDocs / 256 + 1)).toInt
    docs
      .select(col("doc_id").cast("long"), col("text"),
        (col("lang") === "en").cast("long").as("y"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val fb = new FeatBuilder
        it.map { case (docId, text, y) =>
          val (bs, xs) = fb(text)
          DocFeat(docId, y, bs, xs)
        }
      }
      .rdd.repartition(parts)
  }

  /** Per-partition featurizer (one Pattern + MessageDigest per task):
    * text → sorted parallel (bucket, x-micro) arrays with the bias
    * feature appended. Shared by the batch feature build and the
    * streaming scorer so both sides quantize identically.
    */
  private[graft] final class FeatBuilder extends Serializable {
    private val wordRe = java.util.regex.Pattern.compile("[a-z0-9]+")
    private val md = java.security.MessageDigest.getInstance("MD5")

    def apply(text: String): (Array[Int], Array[Long]) = {
      val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += m.group()
      val cnt = scala.collection.mutable.LongMap.empty[Long]
      var i = 0
      while (i < toks.length - 1) {
        md.reset()
        val dig = md.digest((toks(i) + " " + toks(i + 1)).getBytes("UTF-8"))
        // unsigned big-endian int of the first 4 md5 bytes == the
        // first 8 hex chars parsed base-16 (the t27/t18 convention,
        // spelled in integer arithmetic — the hex-format/parse
        // round-trip was measurably the feature build's hot spot)
        val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        val b = (v % B).toInt
        cnt(b.toLong) = cnt.getOrElse(b.toLong, 0L) + 1L
        i += 1
      }
      val sorted = cnt.toArray.sortBy(_._1)
      val bs = new Array[Int](sorted.length + 1)
      val xs = new Array[Long](sorted.length + 1)
      if (sorted.nonEmpty) {
        val ssq = sorted.iterator.map(c => c._2 * c._2).sum
        val norm = math.sqrt(ssq.toDouble)
        i = 0
        while (i < sorted.length) {
          bs(i) = sorted(i)._1.toInt
          xs(i) = math.floor(sorted(i)._2 * 1e6 / norm).toLong
          i += 1
        }
      }
      bs(sorted.length) = B
      xs(sorted.length) = 1000000L
      (bs, xs)
    }
  }

  /** K full-batch GD steps; returns the B+1 weights. Each step ships
    * the weights as one broadcast, runs the fused z/residual/gradient
    * loop per partition (two passes over each doc's arrays), and
    * tree-merges the ≤(B+1)-entry long partials as BigInt.
    */
  private[graft] def train(data: RDD[DocFeat], nDocs: Long): Array[Long] = {
    val sc = data.sparkContext
    val w = Array.fill(B + 1)(0L)
    if (nDocs == 0) return w
    val denom = BigInt(nDocs) * 1000000
    for (step <- 0 until Steps) {
      val bw = sc.broadcast(w.clone())
      val g = data
        .mapPartitions { it =>
          val acc = new Array[Long](B + 1)
          // boundary hits are COLLECTED, not thrown: a mid-task abort on
          // the first unlucky doc would kill the step with one anonymous
          // residual in hand — accumulating (docId, q) pairs (capped at 8
          // per partition) lets the step finish its map and fail AT STEP
          // END with the offending doc ids, so an operator seeing the
          // error knows it is the cross-engine quantization seam (and
          // which documents trip it), not bad data
          val bad = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
          val wv = bw.value
          it.foreach { d =>
            var z = 0L
            var i = 0
            while (i < d.bs.length) { z += wv(d.bs(i)) * d.xs(i); i += 1 }
            // StrictMath (fdlibm) rather than the math.exp intrinsic: the
            // sigmoid is the loop's ONE non-integer op, and the DuckDB
            // replay recomputes it with libm — pinning the JVM side to the
            // platform-stable fdlibm keeps the floor((y-p)*1e6) residual
            // reproducible across JDKs/CPUs. (A 1-ulp exp difference only
            // matters if (y-p)*1e6 lands exactly on an integer boundary —
            // never observed at freeze time, but why carry the risk.)
            val p = 1.0 / (1.0 + StrictMath.exp(-z / 1e12))
            val q = (d.y - p) * 1e6
            // the 1-ulp cross-engine seam made LOUD: DuckDB's replay uses
            // the platform libm's exp, so floor(q) only agrees if q is
            // not within a few ulps of an integer boundary. Guard rather
            // than hope — a residual inside the 8-ulp band fails the job
            // at step end with a pointer at the seam instead of flipping
            // one gradient coordinate silently (never observed at freeze
            // time). Exempt the sigmoid's exactly-representable fixed
            // points — p = 0.5 (z = 0, every doc on step 1: exp(0) = 1
            // exactly in EVERY libm) and the saturated p = 0/1 — where q
            // is an exact integer on both engines by construction.
            val exactFixedPoint = p == 0.5 || p == 0.0 || p == 1.0
            if (!exactFixedPoint && math.abs(q - math.rint(q)) <= 8 * math.ulp(q)
                && bad.length < 8)
              bad += ((d.docId, q))
            val r = math.floor(q).toLong
            i = 0
            while (i < d.bs.length) { acc(d.bs(i)) += d.xs(i) * r; i += 1 }
          }
          Iterator.single((acc.map(BigInt(_)), bad.toList))
        }
      // plain reduce folds partials at the driver — one job, no extra
      // stage (treeReduce's per-step shuffle measured 0.07 s/step of
      // pure overhead here); above ~256 partials the driver fold is no
      // longer trivial, so a wide cluster switches to the tree merge
      def mergePartials(a: (Array[BigInt], List[(Long, Double)]),
                        b: (Array[BigInt], List[(Long, Double)])) =
        (Array.tabulate(B + 1)(i => a._1(i) + b._1(i)), (a._2 ++ b._2).take(8))
      val (merged, boundaryHits) =
        if (data.getNumPartitions > 256) g.treeReduce(mergePartials _)
        else g.reduce(mergePartials _)
      bw.destroy()
      if (boundaryHits.nonEmpty)
        throw new IllegalStateException(
          s"quality-classifier GD step $step: ${boundaryHits.length}+ residuals " +
            s"within 8 ulps of an integer boundary — the floor((y-p)*1e6) " +
            s"quantization is not cross-engine stable for doc ids " +
            s"${boundaryHits.map(_._1).mkString("[", ", ", "]")} " +
            s"(residuals ${boundaryHits.map(_._2).mkString("[", ", ", "]")}); " +
            "this is the Spark/DuckDB sigmoid seam, not bad data — exclude or " +
            "perturb these documents, or widen the quantization")
      var b = 0
      while (b <= B) {
        w(b) += tdiv(BigInt(Eta) * merged(b), denom).toLong
        b += 1
      }
    }
    w
  }

  /** Build + persist the feature matrix and train — the offline half of
    * the train-offline/score-online pattern (n25 trains here, then
    * scores a document STREAM with the returned weights).
    */
  def trainOn(docs: DataFrame, nDocs: Long): Array[Long] = {
    val data = featureRdd(docs, nDocs).persist(StorageLevel.MEMORY_AND_DISK)
    data.count()
    try train(data, nDocs)
    finally data.unpersist(blocking = false) // weights captured; don't let
    // the feature blocks outlive the call in a long-lived session
  }

  /** Stateless scorer for a document stream (works on a batch frame
    * too): featurize row-locally with the SAME FeatBuilder the trainer
    * used, dot with the broadcast weights, emit
    * (doc_id, ts, logit_micro, keep). Model scoring is the
    * embarrassingly-streamable half of the pipeline — zero state, one
    * 8 KB broadcast, so the scorer runs at ingest rate at any scale;
    * only training needs the multi-pass batch substrate.
    */
  def scoreStream(docs: DataFrame, w: Array[Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = spark.sparkContext.broadcast(w)
    docs
      .select(col("doc_id").cast("long"), col("text"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .mapPartitions { it =>
        val fb = new FeatBuilder
        val wv = bw.value
        it.map { case (id, text, ts) =>
          val (bs, xs) = fb(text)
          var z = 0L
          var i = 0
          while (i < bs.length) { z += wv(bs(i)) * xs(i); i += 1 }
          (id, ts, tdiv(BigInt(z), BigInt(1000000)).toLong,
            if (z > 0) 1L else 0L)
        }
      }
      .toDF("doc_id", "ts", "logit_micro", "keep")
  }

  /** Train on the corpus and score every document:
    * (doc_id, label, logit_micro = tdiv(z, 1e6), keep = [z > 0]).
    */
  def classify(docs: DataFrame, nDocs: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val data = featureRdd(docs, nDocs).persist(StorageLevel.MEMORY_AND_DISK)
    data.count()
    val w = train(data, nDocs)
    val bw = spark.sparkContext.broadcast(w)
    val scored = data
      .map { d =>
        val wv = bw.value
        var z = 0L
        var i = 0
        while (i < d.bs.length) { z += wv(d.bs(i)) * d.xs(i); i += 1 }
        (d.docId, d.y, tdiv(BigInt(z), BigInt(1000000)).toLong,
          if (z > 0) 1L else 0L)
      }
      .toDF("doc_id", "label", "logit_micro", "keep")
      // one eager pass materializes the (4-col, 1-row/doc) scores so the
      // fat feature blocks can be dropped NOW instead of living for the
      // session; the checkpoint blocks are context-cleaned on GC
      .localCheckpoint(true)
    data.unpersist(blocking = false)
    scored
  }
}
