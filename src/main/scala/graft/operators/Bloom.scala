package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build + membership pruning — the runtime join
  * filter that makes selective fact⋈dim joins cheap at 100 TB.
  *
  * The classic scale problem: `lineitem ⋈ (σ part)` shuffles every fact row
  * even though only the rows whose key survives the dim filter matter. A
  * Bloom filter built from the filtered dim keys and evaluated *under the
  * fact scan* drops the dead rows before the exchange, shrinking shuffle
  * volume by the join selectivity (Spark's own `InjectRuntimeFilter` does
  * this only for shuffle-heavy plans and under size heuristics; this
  * operator is the explicit form with a declared budget).
  *
  * Design:
  *   - bit positions are computed with the SAME Spark expressions on both
  *     the build and probe side (`xxhash64(key, seed) mod m`), so no hash
  *     implementation is duplicated in JVM code;
  *   - the build aggregates positions into an `Array[Long]` bitset via a
  *     mergeable [[BitsetAgg]] (map-side partials OR together — the shuffle
  *     carries one m-bit sketch per partition, never the keys);
  *   - the single finished sketch (m/8 bytes; 16 KB at the default m=2^17)
  *     is collected and inlined as a literal, i.e. broadcast with the plan —
  *     the same contractual small-side collect as the ANN query vectors;
  *   - membership is `getbit(element_at(bits, word), pos)` — pure codegen'd
  *     expressions, no UDF in the fact-scan hot path.
  *
  * False positives only re-admit rows the exact join drops afterwards, so
  * the operator never changes results (spec + oracle-checked); false
  * negatives are impossible by construction.
  */
object Bloom {

  /** Mergeable bitset aggregator over bit positions in [0, numBits). */
  final class BitsetAgg(numBits: Int)
      extends Aggregator[Int, Array[Long], Array[Long]] {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(b: Array[Long], pos: Int): Array[Long] = {
      b(pos >>> 6) |= 1L << (pos & 63)
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The k bit positions of `key` — shared by build and probe so the two
    * sides can never disagree on the hash family.
    */
  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { seed =>
      pmod(xxhash64(key, lit(seed)), lit(numBits)).cast("int")
    }

  /** Build a Bloom filter over `keys.col(keyCol)`: returns the bitset words.
    * One narrow pass + a sketch-sized collect (never the keys themselves).
    */
  def build(keys: DataFrame, keyCol: String, numBits: Int = 1 << 17,
            numHashes: Int = 3): Array[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val agg = udaf(new BitsetAgg(numBits), Encoders.scalaInt)
    val rows = keys
      .select(explode(array(positions(col(keyCol), numBits, numHashes): _*)).as("pos"))
      .agg(agg(col("pos")).as("bits"))
      .collect()
    if (rows.isEmpty || rows(0).isNullAt(0)) new Array[Long](numBits / 64)
    else rows(0).getSeq[Long](0).toArray
  }

  /** Membership test as a pure-expression Column (codegen'd; safe to push
    * under the fact scan). May yield false positives, never negatives.
    */
  def mightContain(bits: Array[Long], key: Column, numHashes: Int = 3): Column = {
    val numBits = bits.length * 64
    val words = lit(bits)
    positions(key, numBits, numHashes).map { pos =>
      getbit(element_at(words, (pos / lit(64)).cast("int") + lit(1)),
        (pos % lit(64)).cast("long")) === lit(1)
    }.reduce(_ && _)
  }
}
