package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{functions => F}

/** Kernel checks for the round-10 training-data additions: exact
  * duplicated-substring spans (Dedup.dupSpans) and the HyperLogLog
  * sketch (Sketches.hllRegisters/hllEstimate). The DuckDB gates
  * (d16, t24) check cross-engine parity on the real corpus; these
  * specs pin the SEMANTICS on hand-built inputs where the expected
  * output is derivable by eye.
  */
class DupSpansHllSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(rows: (Long, String)*): Seq[(Long, Long, Long, Long)] =
    Dedup.dupSpans(docs(rows: _*))
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  // ---- dupSpans ---------------------------------------------------------

  test("dupSpans: an 8-token run shared by two docs is one span in each") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val out = spans(
      1L -> s"$shared alpha beta gamma",
      2L -> s"delta epsilon $shared")
    // doc 1: tokens 0..7; doc 2: tokens 2..9
    assert(out == Seq((1L, 0L, 7L, 8L), (2L, 2L, 9L, 8L)))
  }

  test("dupSpans: overlapping windows of a longer run merge into one maximal span") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val out = spans(1L -> shared, 2L -> shared)
    // 5 hit windows (pos 0..4) merge into one [0, 11] span per doc
    assert(out == Seq((1L, 0L, 11L, 12L), (2L, 0L, 11L, 12L)))
  }

  test("dupSpans: runs separated by enough unique tokens stay separate spans") {
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    // 9 unique tokens between the runs in doc 1 (> L gap between window
    // starts); doc 2 carries the runs in the other order with its own gap
    val out = spans(
      1L -> s"$runA u1 u2 u3 u4 u5 u6 u7 u8 u9 $runB",
      2L -> s"$runB v1 v2 v3 v4 v5 v6 v7 v8 v9 $runA")
    assert(out == Seq(
      (1L, 0L, 7L, 8L), (1L, 17L, 24L, 8L),
      (2L, 0L, 7L, 8L), (2L, 17L, 24L, 8L)))
  }

  test("dupSpans: a shared run shorter than the window emits nothing") {
    val shared = (1 to 7).map(i => s"tok$i").mkString(" ")
    val out = spans(
      1L -> s"$shared one two three four",
      2L -> s"five six seven eight $shared")
    assert(out.isEmpty)
  }

  test("dupSpans: a run duplicated only within ONE doc emits nothing") {
    val run = (1 to 8).map(i => s"tok$i").mkString(" ")
    val out = spans(
      1L -> s"$run x1 x2 x3 x4 x5 x6 x7 x8 $run",
      2L -> "totally different words with no overlap at all here now")
    assert(out.isEmpty)
  }

  // ---- scrubSpans -------------------------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def scrub(rows: (Long, String)*): Seq[(Long, Long, Long, Long, String)] = {
    val d = docs(rows: _*)
    Dedup.scrubSpans(d, Dedup.dupSpans(d))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq
  }

  test("scrubSpans: cuts the shared run, keeps the rest, hashes the survivors") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val out = scrub(
      1L -> s"$shared alpha beta gamma",
      2L -> s"delta epsilon $shared")
    // doc 1 keeps [alpha beta gamma], doc 2 keeps [delta epsilon]
    assert(out == Seq(
      (1L, 11L, 3L, 8L, md5hex("alpha beta gamma")),
      (2L, 10L, 2L, 8L, md5hex("delta epsilon"))))
  }

  test("scrubSpans: a fully-duplicated doc empties to the md5 of the empty string") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val out = scrub(1L -> shared, 2L -> s"$shared trailing words here")
    assert(out.head == ((1L, 12L, 0L, 12L, md5hex(""))))
    assert(out(1) == ((2L, 15L, 3L, 12L, md5hex("trailing words here"))))
  }

  test("scrubSpans: span-free and token-free docs pass through untouched") {
    val out = scrub(
      1L -> "completely unique words that nothing else shares anywhere",
      2L -> "!!! ???") // no [a-z0-9]+ tokens at all
    assert(out == Seq(
      (1L, 8L, 8L, 0L,
        md5hex("completely unique words that nothing else shares anywhere")),
      (2L, 0L, 0L, 0L, md5hex(""))))
  }

  // ---- HLL --------------------------------------------------------------

  private def keys(n: Int, offset: Long = 0L) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => offset + i * 7919L).toDF("k")
  }

  private def registers(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    Sketches.hllRegisters(df, "k").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("hll: register table is partitioning-invariant") {
    val ks = keys(5000)
    assert(registers(ks.repartition(1)) == registers(ks.repartition(7)))
  }

  test("hll: registers of disjoint halves max-merge to the union's registers") {
    val a = keys(3000)
    val b = keys(3000, offset = 1000000L)
    val union = registers(a.union(b))
    val ra = registers(a); val rb = registers(b)
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    assert(merged == union)
  }

  test("hll: estimate within 15% on 20k distinct keys, duplicate-insensitive") {
    val ks = keys(20000)
    val withDups = ks.union(keys(5000)) // re-insert a quarter of them
    val est = Sketches.hllEstimate(Sketches.hllRegisters(withDups, "k"))
      .collect()(0).getDouble(2)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"est=$est")
  }

  test("hll: small cardinalities take the linear-counting branch and stay tight") {
    val est = Sketches.hllEstimate(Sketches.hllRegisters(keys(100), "k"))
      .collect()(0)
    assert(est.getLong(1) > 0) // empty registers present
    assert(math.abs(est.getDouble(2) - 100.0) / 100.0 < 0.15, s"est=$est")
  }
}
