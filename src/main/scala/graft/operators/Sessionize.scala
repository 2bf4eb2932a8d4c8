package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive rows of the same key belong to
  * one session while the gap between them stays <= `gap` (in the units
  * of `orderCol` — µs for event time here).
  *
  * The batch form is two window passes over ONE sort shuffle on the key:
  * flag rows whose gap from the previous row exceeds the threshold, then
  * running-sum the flags into a session ordinal — the standard
  * declarative sessionize, linear per key, no state machine, no UDAF.
  * (The streaming twin is Spark's `session_window`, see
  * StreamingOps.sessionQuality — same semantics, watermark-managed
  * state.)
  *
  * `orderCols` must totally order rows within a key (append a unique id)
  * or session ordinals become arrival-order dependent.
  */
object Sessionize {

  def sessionize(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                 gapCol: Column, gap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("__new_s",
        when(gapCol - lag(gapCol, 1).over(w) > gap, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_s")
  }
}
