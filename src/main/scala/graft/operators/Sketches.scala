package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.immutable.TreeSet

/** Mergeable sketch aggregates.
  *
  * KMV ("k minimum values", Bar-Yossef et al. 2002) distinct-count sketch:
  * keep the k smallest *distinct* hash values seen; the k-th smallest,
  * read as a fraction of the hash space, estimates distinct-count as
  * (k-1)/frac. The state is a bounded ordered set, the merge is a set
  * union re-truncated to k — associative, commutative and idempotent, so
  * map-side partial aggregation applies and the shuffle carries at most
  * k hashes per group regardless of input size (the 100 TB property:
  * sketching 10^11 distinct shingles per source still moves only k
  * strings per source).
  *
  * Every retained KMV value is an exact md5 the DuckDB oracle reproduces
  * verbatim — the gate hash-checks the sketch itself, not just a
  * tolerance on the estimate. The HLL below (`hllRegisters`) gets the
  * same treatment: its register layout is pinned to xxhash64 bits that
  * the oracle recomputes in HUGEINT SQL, so both sketches are
  * cross-engine bit-exact.
  * Reference analog: the knob tuner's seen-hash sets
  * (`code/src/offline/knob_tuner.py:189-196`) are exact; this is the
  * bounded-memory version a 100 TB corpus forces.
  */
object Sketches {

  /** Insert one hash into a bounded min-k set. */
  private[operators] def insert(k: Int, st: TreeSet[String], h: String): TreeSet[String] =
    if (st.size < k) st + h
    else if (h < st.last && !st.contains(h)) (st + h) - st.last
    else st

  /** Mutating insert into a bounded min-k java TreeSet — the Aggregator
    * contract allows in-place buffer mutation, and at millions of rows per
    * partition the persistent-structure version allocates a fresh tree
    * spine per row (measured ~10x slower at sf0.1).
    */
  private def insertMut(k: Int, st: java.util.TreeSet[String], h: String): Unit =
    if (st.size < k) { st.add(h); () }
    else if (h < st.last && st.add(h)) { st.pollLast(); () }

  /** KMV aggregator over hex hash strings (lexicographic order == numeric
    * order at fixed width). Output is the sorted retained set.
    */
  final class KmvAgg(k: Int)
      extends Aggregator[String, java.util.TreeSet[String], Seq[String]] {
    override def zero: java.util.TreeSet[String] = new java.util.TreeSet[String]()
    override def reduce(b: java.util.TreeSet[String], a: String): java.util.TreeSet[String] = {
      if (a != null) insertMut(k, b, a)
      b
    }
    override def merge(b1: java.util.TreeSet[String],
                       b2: java.util.TreeSet[String]): java.util.TreeSet[String] = {
      b2.forEach(h => insertMut(k, b1, h))
      b1
    }
    override def finish(r: java.util.TreeSet[String]): Seq[String] = {
      val out = Seq.newBuilder[String]
      r.forEach(h => out += h)
      out.result()
    }
    override def bufferEncoder: Encoder[java.util.TreeSet[String]] =
      Encoders.kryo[java.util.TreeSet[String]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Driver-side estimate from a retained set (spec + doc use; the gate
    * query computes the same quantity as a column expression so DuckDB
    * can mirror it): distinct ≈ (k-1) * 2^40 / prefix40(kth min).
    */
  def estimate(k: Int, mins: Seq[String]): Long =
    if (mins.size < k) mins.size.toLong
    else (k - 1).toLong * (1L << 40) / java.lang.Long.parseLong(mins.last.take(10), 16)

  /** Map-side KMV partials over word-shingle md5s, as a typed kernel: one
    * tight-loop pass per partition (tokenize -> roll shingles -> md5 ->
    * bounded min-k per group), emitting at most k hashes per (group,
    * partition). The declarative twin (explode shingles -> md5 -> agg) is
    * parity-asserted in SketchesSpec; the kernel exists because the
    * column-expression path materializes a distinct-shingle array per doc
    * and explodes 500+ rows per doc before hashing — measured ~3x slower
    * at sf0.1 (the same trade d02's minhash kernel documents).
    */
  private[graft] def kmvShinglePartials(
      docs: org.apache.spark.sql.DataFrame, k: Int,
      groupCol: String = "source", textCol: String = "text",
      shingleN: Int = 3): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(org.apache.spark.sql.functions.col(groupCol),
        org.apache.spark.sql.functions.col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        val wordRe = java.util.regex.Pattern.compile("[a-z0-9]+")
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        val partials = scala.collection.mutable.Map.empty[String, java.util.TreeSet[String]]
        it.foreach { case (grp, text) =>
          val st = partials.getOrElseUpdate(grp, new java.util.TreeSet[String]())
          val toks = {
            val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (m.find()) buf += m.group()
            buf
          }
          var i = 0
          while (i + shingleN <= toks.length) {
            md.reset()
            md.update(toks(i).getBytes("UTF-8"))
            var j = 1
            while (j < shingleN) {
              md.update(' '.toByte); md.update(toks(i + j).getBytes("UTF-8")); j += 1
            }
            val dig = md.digest()
            val sb = new java.lang.StringBuilder(32)
            var b = 0
            while (b < dig.length) {
              sb.append(hex((dig(b) >> 4) & 0xf)); sb.append(hex(dig(b) & 0xf)); b += 1
            }
            insertMut(k, st, sb.toString)
            i += 1
          }
        }
        partials.iterator.flatMap { case (grp, st) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          st.forEach(h => out += ((grp, h)))
          out.iterator
        }
      }
      .toDF(groupCol, "h")
  }

  /** Log2-binned histogram quantile sketch over a positive integral
    * column (DDSketch with γ=2, Masson'19): the input collapses to ≤64
    * (bin, count) cells — bin = bit-length, a pure integer expression —
    * so the shuffle is O(64) no matter the input size, and the merge of
    * two sketches is cell-wise addition (here: the same groupBy). For
    * each requested milli-quantile the answer is the smallest bin whose
    * cumulative count covers it (`cum*1000 ≥ total*q`, all-integer) and
    * the reported estimate is that bin's inclusive upper edge `2^bin-1`
    * (relative error ≤ 2× by construction; SketchesSpec brackets the
    * exact percentile inside [2^(bin-1), 2^bin)). The single-partition
    * window runs over the 64-cell sketch, never the data.
    */
  def log2HistQuantiles(df: org.apache.spark.sql.DataFrame, valueCol: String,
                        qsMilli: Seq[Int]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val bins = df
      .groupBy(expr(s"length(bin($valueCol))").as("bin"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("total", sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qs = df.sparkSession.range(1).select(
      explode(array(qsMilli.map(lit): _*)).as("q_milli"))
    cum.join(broadcast(qs), col("cum") * 1000 >= col("total") * col("q_milli"))
      .groupBy("q_milli").agg(min("bin").cast("long").as("bin"))
      .withColumn("est_upper", expr("shiftleft(cast(1 as bigint), bin) - 1"))
  }

  // ---- HyperLogLog (Flajolet et al. 2007), m = 256 registers ----------

  /** alpha_m * m^2 for m = 256 — public so the t24 oracle SQL embeds the
    * SAME double literal the Spark plan folds in.
    */
  val hllAlphaMM: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0

  /** HLL register table (bucket, reg) over a long key column: bucket =
    * low 8 bits of xxhash64(key), rank = trailing-zero count + 1 of the
    * remaining 56-bit window (identically geometric to the paper's
    * leading-zero rank on uniform hash bits, but integer-exact: rho =
    * popcount((w & -w) - 1) + 1 is pure integer arithmetic in both
    * engines — no float log anywhere; floor(log2(w)) for the MSB rank
    * rounds wrong near 2^56, and even log2 of an exact power of two is
    * one ulp off for some exponents under libm's log-division, so the
    * truncating int cast could go off-by-one either way).
    * The register table is the sketch state: 256 rows, merged
    * across partitions/corpora by element-wise max — the map-side
    * combine ships bytes per partition at any corpus size.
    */
  def hllRegisters(df: DataFrame, key: String): DataFrame =
    hllProject(df, key)
      .groupBy("bucket").agg(max(col("rho")).as("reg"))

  /** Per-row (bucket, rho) projection behind `hllRegisters`, with
    * pass-through columns — the streaming variant (n24) reuses it under
    * a watermarked event-time window, where the register state is the
    * same bounded 256-rows-per-window monoid.
    */
  def hllProject(df: DataFrame, key: String, keep: org.apache.spark.sql.Column*): DataFrame = {
    val h = xxhash64(col(key))
    df.select(keep :+ h.as("h"): _*)
      .select(keep :+ col("h").bitwiseAND(lit(255L)).as("bucket")
        :+ shiftrightunsigned(col("h"), 8).as("w"): _*)
      .select(keep :+ col("bucket")
        :+ when(col("w") === 0L, lit(57))
          .otherwise((bit_count(col("w").bitwiseAND(-col("w")) - 1) + 1)
            .cast("int")).as("rho"): _*)
  }

  /** Harmonic-mean estimate from a register table, with the small-range
    * linear-counting correction (E <= 2.5m with empty registers). The
    * numerator sum(2^-reg) is computed EXACTLY: scaled by 2^57 each term
    * is an integer power of two (exact in doubles, summed as
    * decimal(38,0)), so the one rounding step is the final division —
    * bit-reproducible against the oracle's HUGEINT recomputation.
    * Returns one row (m, n_zero, hll_estimate).
    */
  def hllEstimate(registers: DataFrame): DataFrame =
    registers
      .agg(count(lit(1)).as("n_present"),
        sum(expr("cast(power(2, 57 - reg) as decimal(38,0))")).as("s_present"))
      .select(col("n_present"),
        (col("s_present") + (lit(256L) - col("n_present"))
          * expr("cast(144115188075855872 as decimal(38,0))")).as("s_total"))
      .select((lit(256L) - col("n_present")).as("n_zero"),
        (lit(hllAlphaMM) / (col("s_total").cast("double") / 1.44115188075855872e17))
          .as("est_raw"))
      .select(lit(256).as("m"), col("n_zero"),
        round(when(col("est_raw") <= 640.0 && col("n_zero") > 0,
            lit(256.0) * log(lit(256.0) / col("n_zero")))
          .otherwise(col("est_raw")), 2).as("hll_estimate"))
}
