package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case behavior of the text/vector column functions under ANSI mode
  * (Spark 4 default) — empty inputs, punctuation-only text, short docs.
  */
class TextFunctionsSpec extends SparkSpec {

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("tokenizers handle empty and punctuation-only text") {
    val df = one("").union(one("?!... --- !!!")).union(one("a b  c"))
    val r = df.select(
      size(TextFunctions.tokens(col("text"))).as("n_tok"),
      TextFunctions.wsTokenCount(col("text")).as("n_ws"),
      TextFunctions.bpeishTokenCount(col("text")).as("n_bpe")).collect()
    assert(r(0).getInt(0) == 0)             // empty: no word tokens
    assert(r(1).getInt(0) == 0 && r(1).getInt(2) > 0) // punct-only: bpe sees marks
    assert(r(2).getInt(0) == 3 && r(2).getInt(1) == 3)
  }

  test("shingles of short docs are empty, never an index error") {
    val df = one("only two").union(one("exactly three words"))
    val r = df.select(size(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))).collect()
    assert(r(0).getInt(0) == 0)
    assert(r(1).getInt(0) == 1)
  }

  test("fingerprint is whitespace/punctuation-insensitive and case-insensitive") {
    val a = one("The QUICK  brown fox!").select(TextFunctions.fingerprint(col("text"))).head().getString(0)
    val b = one("the quick brown fox").select(TextFunctions.fingerprint(col("text"))).head().getString(0)
    val c = one("the quick brown foxes").select(TextFunctions.fingerprint(col("text"))).head().getString(0)
    assert(a == b && a != c)
  }

  test("simhash of empty token list is total-bits-set, deterministic") {
    val r = one("???").select(TextFunctions.simhash64(TextFunctions.tokens(col("text")))).head().getLong(0)
    assert(r == -1L) // all 64 sums are 0 >= 0 -> every bit set
  }

  test("quantize/cosineQ: self-similarity is exactly 1") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Array.tabulate(8)(i => (i + 1) * 0.1f))).toDF("embedding")
    val q = VectorFunctions.quantize(col("embedding"))
    val r = df.select(VectorFunctions.cosineQ(q, q)).head().getDouble(0)
    assert(r == 1.0)
  }

  test("signBucket on mixed-sign vector") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Array(-1.0f, 2.0f, -3.0f, 4.0f))).toDF("embedding")
    val r = df.select(VectorFunctions.signBucket(col("embedding"), Seq(1, 2, 3, 4))).head().getString(0)
    assert(r == "0101")
  }
}
