package graft

import org.apache.spark.sql.functions._

/** Independent check of the t26 BM25 scoring: the expected score is
  * computed in plain Scala from the textbook formula (Lucene idf form,
  * k1=1.2, b=0.75) over a corpus tiny enough to tally by hand — a code
  * path sharing nothing with the Column-expression implementation.
  */
class Bm25Spec extends SparkSpec {

  test("t26 reproduces the textbook BM25 score on a hand-tallied corpus") {
    val s = spark
    import s.implicits._
    // doc 1: 'hash' x2 + 2 fillers (dl=4); doc 2: 'join' x1 + 'hash' x1
    // (dl=2); doc 3: fillers only (dl=3). N=3, avgdl=3.
    val docs = Seq(
      (1L, "hash hash alpha beta"),
      (2L, "join hash"),
      (3L, "gamma delta epsilon")).toDF("doc_id", "text")
      // satisfy the documents read contract (Tables.Contract)
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    val q = graft.queries.TextQueries.all.find(_.name == "t26_bm25").get
    // the catalog signature reads a testdata dir, so stage the corpus
    val dir = java.nio.file.Files.createTempDirectory("bm25spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = q.fn(spark, dir).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    def idf(df: Int, n: Int = 3): Double = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfTerm(tf: Int, dl: Int, avgdl: Double = 3.0): Double =
      tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    // query terms: hash (df=2), join (df=1), spark (df=0 -> absent)
    val exp1 = idf(2) * tfTerm(2, 4)
    val exp2 = idf(2) * tfTerm(1, 2) + idf(1) * tfTerm(1, 2)

    assert(out.keySet == Set(1L, 2L), s"expected docs 1 and 2 scored, got $out")
    assert(math.abs(out(1L) - math.rint(exp1 * 10000) / 10000) < 1e-9, s"doc1: ${out(1L)} vs $exp1")
    assert(math.abs(out(2L) - math.rint(exp2 * 10000) / 10000) < 1e-9, s"doc2: ${out(2L)} vs $exp2")
    // ranking: doc 2 matches two query terms and is short -> ranks first
    assert(out(2L) > out(1L))
  }
}
