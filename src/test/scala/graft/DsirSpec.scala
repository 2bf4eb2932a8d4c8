package graft

import org.apache.spark.sql.functions._

/** Independent check of the t27 DSIR importance weights: the expected
  * micro-nat weight is recomputed in plain Scala (MessageDigest MD5,
  * math.log, explicit add-1 smoothing over B=256 hashed buckets) — a
  * code path sharing nothing with the Column-expression implementation
  * or the DuckDB oracle.
  */
class DsirSpec extends SparkSpec {

  test("t27 reproduces hand-derived hashed-bigram importance weights") {
    val s = spark
    import s.implicits._
    // en docs are the target slice; doc 1's bigrams dominate the target
    // distribution, doc 3's appear only outside it.
    val docs = Seq(
      (1L, "a b a b", "en"),
      (2L, "a b c", "en"),
      (3L, "x y x", "de"),
      (4L, "a b x", "de")).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    val dir = java.nio.file.Files.createTempDirectory("dsirspec").toString
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = graft.queries.TextQueries.all.find(_.name == "t27_dsir_weights").get
    val out = q.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    // independent recomputation
    val B = 256
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      (0 until w.length - 1).map(i => w(i) + " " + w(i + 1))
    }
    def bucket(p: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % B
    }
    val corpus = Seq(
      (1L, "a b a b", "en"), (2L, "a b c", "en"),
      (3L, "x y x", "de"), (4L, "a b x", "de"))
    val occ = corpus.flatMap { case (id, t, lang) => bigrams(t).map(p => (id, lang, bucket(p))) }
    val raw = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tgt = occ.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rr = raw.values.sum; val tt = tgt.values.sum
    def lrMicro(b: Long): Long =
      math.floor((math.log(tgt.getOrElse(b, 0L) + 1.0) - math.log(tt + B.toDouble)
                - math.log(raw.getOrElse(b, 0L) + 1.0) + math.log(rr + B.toDouble)) * 1e6).toLong
    val expW = corpus.map { case (id, t, _) =>
      id -> bigrams(t).map(p => lrMicro(bucket(p))).sum
    }.toMap
    val expN = corpus.map { case (id, t, _) => id -> bigrams(t).length.toLong }.toMap
    val expRk = expW.toSeq.sortBy { case (id, w) => (-w, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val (n, w, rk, keep) = out(id)
      assert(n == expN(id), s"doc $id n_bigrams: $n vs ${expN(id)}")
      assert(w == expW(id), s"doc $id w_micro: $w vs ${expW(id)}")
      assert(rk == expRk(id), s"doc $id rk: $rk vs ${expRk(id)}")
      assert(keep == (if (expRk(id) <= (4 + 3) / 4) 1L else 0L), s"doc $id keep")
    }
    // the target-dominant doc outranks the target-absent doc
    assert(expW(1L) > expW(3L))

    // production arm (benchFn): histogram-threshold keep agrees with the
    // exact-rank keep on this well-separated corpus (decisions can move
    // by at most one 10-milli-nat bucket; these weights are nats apart),
    // and the weight columns are identical
    val bench = q.benchFn.get(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(bench.keySet == out.keySet)
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val (n, w, keep) = bench(id)
      assert(n == expN(id) && w == expW(id), s"doc $id bench weight drifted")
      assert(keep == out(id)._4, s"doc $id: histogram keep disagrees with exact rank")
    }
  }
}
