package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * declarative primitives so Catalyst keeps optimizing around them
  * (SURVEY custom-operator preference (a): compose existing ops).
  *
  * Reference context: the video-etl pipelines repeatedly align a row to
  * the latest earlier row of another kind — detections to the previous
  * frame's tracks (`sort.py` association step), chunk scores to the most
  * recent knob decision (`skyscraper.py` switch loop) — and pair
  * time-extended segments that overlap (`covid_measures.py` clip/segment
  * windows). These are the as-of and interval-overlap joins of that
  * world, re-expressed as single-shuffle relational plans.
  */
object TemporalJoins {

  /** As-of (backward) join: for every left row, attach the payload of
    * the LATEST right row that precedes it in the total `orderCols`
    * order within the same `keys` group; null payload when no right row
    * precedes.
    *
    * Implementation is the union+window form: tag both sides, union,
    * and take `last(payload struct, ignoreNulls)` over a window ending
    * one row before the current. ONE shuffle on (keys) with a sort on
    * (orderCols) — no per-row range probe, no candidate blow-up, no
    * skew amplification beyond the key's own row count, which is why
    * this form survives 100 TB (a range-condition join would rewrite to
    * a per-key nested loop; the window is a linear scan per key).
    *
    * Determinism contract: `orderCols` must totally order the unioned
    * rows (include a unique id — ties between a left and a right row at
    * the same instant are otherwise arrival-order dependent). Payload
    * columns are packed into ONE struct before the window so every
    * attached field comes from the SAME right row even when some payload
    * fields are null.
    *
    * @param payload right-side columns to attach, surfaced as
    *                `asof_<name>`; must exist on the right side
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               orderCols: Seq[String], payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty && payload.nonEmpty)
    val l = left.withColumn("__asof_p",
        lit(null).cast(structType(right, payload)))
      .withColumn("__side", lit(1))
    val r = right
      .select((keys ++ orderCols).distinct.map(col) :+
        struct(payload.map(col): _*).as("__asof_p"): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort by the same orderCols; the frame stops 1 row short
    // of the current row, so "latest strictly-preceding right row" falls
    // out of last(ignoreNulls) — left rows carry a null struct and are
    // transparent to it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = u
      .withColumn("__prev", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = joined.columns
      .filter(c => c != "__asof_p" && c != "__side" && c != "__prev")
      .map(col) ++ payload.map(p => col(s"__prev.$p").as(s"asof_$p"))
    joined.select(out: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  /** Interval-overlap join: all (a, b) pairs whose closed intervals
    * [s, e] intersect. Both inputs need columns (id, s, e) with s/e as
    * comparable longs (ns, frames, offsets — any monotone unit).
    *
    * Implementation: explode each interval into the fixed-width buckets
    * it covers (`sequence(s div B, e div B)`), equi-join on the bucket,
    * then keep exactly the candidate whose bucket contains
    * `greatest(a.s, b.s)` — that bucket lies inside BOTH intervals when
    * they overlap, so every true pair is emitted exactly once with no
    * distinct/dedup shuffle. Candidate fan-out per row is
    * O(interval_len / bucket + 1); pick `bucket` at the typical interval
    * length. The join stays KEYED (bucket equi-join), so AQE's skew
    * split handles a hot time-range, and nothing is ever all-pairs
    * across the full relation — the 100 TB shape. A naive range-predicate
    * join of the same inputs plans a nested-loop cross product.
    */
  def overlapJoin(a: DataFrame, b: DataFrame, bucket: Long): DataFrame = {
    require(bucket > 0)
    // `div` (integer division), NOT `/`+cast: epoch-ns longs exceed 2^53,
    // where double division loses ulps and can flip a bucket boundary
    def explodeBuckets(df: DataFrame, p: String): DataFrame =
      df.select(col("id").as(s"${p}_id"), col("s").as(s"${p}_s"),
          col("e").as(s"${p}_e"))
        .withColumn("bucket",
          explode(sequence(expr(s"${p}_s div ${bucket}L"), expr(s"${p}_e div ${bucket}L"))))
    explodeBuckets(a, "a")
      .join(explodeBuckets(b, "b"), "bucket")
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("bucket") === expr(s"greatest(a_s, b_s) div ${bucket}L"))
      .select("a_id", "b_id", "a_s", "b_s")
  }
}
