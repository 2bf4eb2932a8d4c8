package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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
  * Unlike HLL (whose register layout is engine-specific), every retained
  * value is an exact md5 the DuckDB oracle reproduces verbatim — the gate
  * hash-checks the sketch itself, not just a tolerance on the estimate.
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

  /** KMV aggregator over hex hash strings (lexicographic order == numeric
    * order at fixed width). Output is the sorted retained set.
    */
  final class KmvAgg(k: Int) extends Aggregator[String, TreeSet[String], Seq[String]] {
    override def zero: TreeSet[String] = TreeSet.empty[String]
    override def reduce(b: TreeSet[String], a: String): TreeSet[String] =
      if (a == null) b else insert(k, b, a)
    override def merge(b1: TreeSet[String], b2: TreeSet[String]): TreeSet[String] =
      b2.foldLeft(b1)(insert(k, _, _))
    override def finish(r: TreeSet[String]): Seq[String] = r.toSeq
    override def bufferEncoder: Encoder[TreeSet[String]] = Encoders.kryo[TreeSet[String]]
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
}
