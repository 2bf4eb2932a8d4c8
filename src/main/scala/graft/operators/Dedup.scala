package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines.
  *
  * Scale design: every path reduces the O(n²) pair space to per-key groups
  * BEFORE any join — exact dedup groups on a 128-bit content hash, MinHash
  * groups on LSH band signatures, SimHash groups on fingerprint prefixes.
  * All joins are therefore shuffled equi-joins on uniformly-distributed
  * hash keys (no skew, no cross join anywhere), which is what lets the same
  * code run at 100 TB: pair candidates grow with the duplicate density,
  * not with n².
  */
object Dedup {

  /** Exact dedup on normalized content: keeps the smallest id per
    * fingerprint (deterministic representative — knob_tuner.py:189-196's
    * `seen`-set semantics).
    */
  def exact(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col(text)))
      .groupBy("fp")
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Shingle table: (id, shingle) distinct word-n-gram pairs. */
  def shingleTable(docs: DataFrame, id: String, text: String, n: Int): DataFrame =
    docs
      .select(col(id), explode(shingles(tokens(col(text)), n)).as("shingle"))
      .distinct()

  /** MinHash-LSH near-duplicate candidate pairs + exact Jaccard verify.
    *
    * k seeds, bands of `rowsPerBand`; docs sharing any band signature are
    * candidates; candidates are then verified with exact shingle-set
    * Jaccard (common / (|A| + |B| - common)) and filtered at `minJaccard`.
    * Returns (doc_a, doc_b, jaccard).
    */
  def minhashNearDups(
      docs: DataFrame,
      id: String = "doc_id",
      text: String = "text",
      shingleN: Int = 3,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.05): DataFrame = {

    val sh = shingleTable(docs, id, text, shingleN).cache()

    // per-doc signature: minhash per seed, banded; band signature = min||max
    // within the band (order-free combiner, deterministic in any engine).
    val mh = sh
      .select(col(id) +: (0 until numHashes).map(s =>
        md5(concat(lit(s"$s#"), col("shingle"))).as(s"h$s")): _*)
      .groupBy(id)
      .agg(min(col("h0")).as("m0"), (1 until numHashes).map(s => min(col(s"h$s")).as(s"m$s")): _*)

    val numBands = numHashes / rowsPerBand
    val bands = mh.select(
      col(id),
      explode(array((0 until numBands).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(s => col(s"m$s"))
        struct(lit(b).as("band"), concat(least(cols: _*), greatest(cols: _*)).as("sig"))
      }: _*)).as("bs"))
      .select(col(id), col("bs.band").as("band"), col("bs.sig").as("sig"))

    val a = bands.alias("a"); val b = bands.alias("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"))
      .distinct()

    val sa = sh.select(col(id).as("doc_a"), col("shingle"))
    val sb = sh.select(col(id).as("doc_b"), col("shingle"))
    val common = cand
      .join(sa, "doc_a").join(sb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))

    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n"))
    common
      .join(sizes.withColumnRenamed(id, "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed(id, "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup clusters: 64-bit fingerprint; docs whose fingerprints
    * share all of the 4 16-bit sub-bands are grouped (hamming-0 within
    * band ⇒ candidate; standard simhash blocking).
    */
  def simhashTable(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), simhash64(tokens(col(text))).as("simhash"))

  def simhashCandidates(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val t = simhashTable(docs, id, text)
    val banded = t.select(col(id), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col(id), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
  }
}
