package graft

import org.apache.spark.sql.functions._

/** Independent check of the t29 quality classifier: the ENTIRE integer
  * GD training loop (hashed-bigram features, L2 micro quantization,
  * micro residuals, truncated weight updates) is recomputed in plain
  * single-threaded Scala — a code path sharing nothing with the Column
  * expressions or the DuckDB recursive-CTE oracle — and the scored
  * output must match bit-for-bit. Plus a constructed corpus where the
  * model must actually LEARN (disjoint vocabularies ⇒ perfect
  * separation), and the bias-only edge cases.
  */
class QualityClassifierSpec extends SparkSpec {

  private val B = graft.operators.QualityClassifier.B
  private val Steps = graft.operators.QualityClassifier.Steps
  private val Eta = graft.operators.QualityClassifier.Eta

  private def tdiv(a: BigInt, b: BigInt): BigInt =
    if (a.signum >= 0) a / b else -((-a) / b)

  /** Plain-Scala replay of the identical integer algorithm. */
  private def reference(docs: Seq[(Long, String, String)])
      : Seq[(Long, Long, Long, Long)] = {
    val wordRe = java.util.regex.Pattern.compile("[a-z0-9]+")
    def bucket(p: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % B).toInt
    }
    val feats = docs.map { case (id, text, lang) =>
      val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
      val tk = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) tk += m.group()
      val cnt = scala.collection.mutable.Map.empty[Int, Long]
      for (i <- 0 until math.max(0, tk.length - 1)) {
        val b = bucket(tk(i) + " " + tk(i + 1))
        cnt(b) = cnt.getOrElse(b, 0L) + 1L
      }
      val f = scala.collection.mutable.Map.empty[Int, Long]
      if (cnt.nonEmpty) {
        val ssq = cnt.values.map(c => c * c).sum
        cnt.foreach { case (b, c) =>
          f(b) = math.floor(c * 1e6 / math.sqrt(ssq.toDouble)).toLong
        }
      }
      f(B) = 1000000L
      (id, if (lang == "en") 1L else 0L, f.toMap)
    }
    val n = BigInt(docs.length) * 1000000
    val w = Array.fill(B + 1)(0L)
    for (_ <- 0 until Steps) {
      val grad = Array.fill(B + 1)(BigInt(0))
      feats.foreach { case (_, y, f) =>
        val z = f.iterator.map { case (b, x) => w(b) * x }.sum
        val p = 1.0 / (1.0 + StrictMath.exp(-z / 1e12)) // fdlibm, matches the production sigmoid
        val r = math.floor((y - p) * 1e6).toLong
        f.foreach { case (b, x) => grad(b) += BigInt(x) * r }
      }
      for (b <- 0 to B) w(b) += tdiv(BigInt(Eta) * grad(b), n).toLong
    }
    feats.map { case (id, y, f) =>
      val z = f.iterator.map { case (b, x) => w(b) * x }.sum
      (id, y, tdiv(BigInt(z), BigInt(1000000)).toLong, if (z > 0) 1L else 0L)
    }.sortBy(_._1)
  }

  private def run(dir: String): Seq[(Long, Long, Long, Long)] =
    graft.queries.TextQueries.all.find(_.name == "t29_quality_classifier").get
      .fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("t29 matches the plain-Scala integer GD replay on sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(run(sfDir) === reference(docs))
  }

  test("t29 learns a separable corpus and handles bias-only docs") {
    val s = spark
    import s.implicits._
    // disjoint vocabularies: en docs speak {alpha..delta}, the rest
    // {omega..psi} — separable, so keep must equal label after 64 steps.
    // Doc 20 is token-free and doc 21 single-token (no bigrams): both
    // carry only the bias feature and must still appear, scored by the
    // shared bias weight (majority class here is en ⇒ keep = 1).
    val en = (0L until 10L).map(i =>
      (i, s"alpha beta gamma delta alpha beta gamma delta alpha$i", "en"))
    val de = (10L until 18L).map(i =>
      (i, s"omega psi chi omega psi chi omega psi chi$i", "de"))
    val edge = Seq((20L, "", "en"), (21L, "solitary", "de"))
    val dir = java.nio.file.Files.createTempDirectory("qcspec").toString
    (en ++ de ++ edge).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = run(dir)
    val docsSeq = (en ++ de ++ edge).map { case (i, t, l) => (i, t, l) }
    assert(out === reference(docsSeq))

    val byId = out.map(r => r._1 -> r).toMap
    // perfect separation on the bigram-bearing docs
    (en.map(_._1) ++ de.map(_._1)).foreach { id =>
      assert(byId(id)._4 === byId(id)._2, s"doc $id keep != label")
    }
    // bias-only docs present, share one logit (same single feature)
    assert(byId(20L)._3 === byId(21L)._3)
    assert(out.size === 20)
  }

  test("t30 composite equals the two-stage plain-Scala replay (sf0.001)") {
    // stage 1 via the t28 gate (its own oracle pins it), stage 2 via
    // this spec's plain-Scala integer GD reference over the filtered
    // corpus — composition checked against composition
    val buck = graft.queries.TextQueries.all.find(_.name == "t28_ccnet_bucket").get
      .fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val keptIds = buck.filter(_._2 <= 2L).keySet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => keptIds(d._1)).toSeq
    val expect = reference(docs)
      .map { case (id, y, lg, kp) => (id, y, buck(id), lg, kp) }
    val out = graft.queries.TextQueries.all.find(_.name == "t30_curation_pipeline").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out === expect)
    // training on the filtered corpus must actually change the model
    // (different N and feature mass ⇒ different weights/logits)
    val raw = run(sfDir).map(r => r._1 -> r._3).toMap
    assert(out.exists(o => raw(o._1) != o._4))
  }

  test("n25 streaming gate equals the batch t29 rollup (sf0.001)") {
    val batch = graft.queries.TextQueries.all
      .find(_.name == "t29_quality_classifier").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // the oracle's window arithmetic, replayed from the batch output
    val expect = batch
      .groupBy { case (id, _, _) => (id * 7 % 3600 + 3600) / 600 * 600 }
      .map { case (ws, rows) =>
        (ws, rows.size.toLong, rows.map(_._3).sum, rows.map(_._2).sum)
      }.toSeq.sortBy(_._1)
    val stream = graft.queries.StreamingQueries.all
      .find(_.name == "n25_stream_quality_gate").get
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(stream === expect)
  }
}
