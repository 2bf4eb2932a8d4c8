package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import BpeLearner._

  test("mergePair is greedy left-to-right non-overlapping") {
    assert(mergePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergePair(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(mergePair(Seq("x"), "a", "b") == Seq("x"))
    assert(mergePair(Seq.empty, "a", "b") == Seq.empty)
  }

  test("learnLocal on a hand-checked corpus") {
    // classic BPE example: {"low":5, "lower":2} — 'l o w' dominates
    val merges = learnLocal(Map("low" -> 5L, "lower" -> 2L), 3)
    // step 1: (l,o) n=7; step 2: (lo,w) n=7; step 3: tie at n=2 between
    // (low,e) and (e,r) — lexicographic tie-break picks (e,r)
    assert(merges == Seq(("l", "o", 7L), ("lo", "w", 7L), ("e", "r", 2L)))
  }

  test("distributed learnMerges equals the single-threaded reference and is partition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val texts = Seq(
      "the cat sat on the mat", "the bat and the cat", "a rat sat",
      "mat bat cat rat", "the the the cat")
    // word frequencies of the corpus above
    val freqs = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val expected = learnLocal(freqs, 6).zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, n) }
    def run(parts: Int) = {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(parts)
      learnMerges(docs, steps = 6)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(run(1) == expected)
    assert(run(5) == expected)
  }

  test("encodeExpr replace-chain equals the reference greedy encoder") {
    val spark2 = spark
    import spark2.implicits._
    // merges chosen to exercise overlap (a,a), chaining (l,o)->(lo,w) and
    // boundary safety (symbol 'ba' must not fake an 'a b' match)
    val merges = Seq("a" -> "a", "l" -> "o", "lo" -> "w", "b" -> "a", "e" -> "r")
    val words = Seq("aaa", "lower", "low", "baba", "abab", "x", "aabaa", "wool")
    val got = words.toDF("w")
      .withColumn("sym", BpeLearner.encodeExpr(org.apache.spark.sql.functions.col("w"), merges))
      .withColumn("n", BpeLearner.encodedTokenCount(org.apache.spark.sql.functions.col("sym")))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    words.foreach { w =>
      val ref = BpeLearner.encodeLocal(w, merges)
      assert(got(w)._1 == ref.map("{" + _ + "}").mkString, s"symbols differ for '$w'")
      assert(got(w)._2 == ref.size, s"count differs for '$w'")
    }
  }

  test("t22's frozen merge table equals learnMerges on the sf0.01 corpus") {
    // t22_bpe_encode applies TextQueries.t22Merges as a fixed tokenizer;
    // this pins the composition: the frozen table IS what the t19 training
    // loop learns at the gate scale (so the two gates together cover
    // train→apply without t22's gate depending on the training corpus).
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists(), s"$dir missing")
    val spark2 = spark
    import spark2.implicits._
    val learned = learnMerges(graft.Tables.documents(spark, dir), steps = 12)
      .orderBy("step").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    assert(learned == graft.queries.TextQueries.t22Merges)
  }
}
