package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling operators.
  *
  * Sampling in a 100 TB pipeline must be reproducible (re-runs and
  * retried tasks must pick the SAME rows), partitioning-independent, and
  * stateless — which rules out `df.sample` (seed + partition layout
  * dependent). The recipe here is content-hash membership, the same
  * trick as the t07 train/val split: a row's 16-bit md5 bucket is a
  * pure function of its content, so membership survives repartitioning,
  * speculative re-execution, and incremental re-ingestion.
  */
object Sampling {

  /** Downsample over-represented groups to the size of the smallest
    * group (the "equalize domains" step a domain-mixture plan executes,
    * cf. t09's mixture weights): a row of group g with n_g rows is kept
    * iff bucket(row) * n_g < 65536 * min_n — i.e. with probability
    * min_n / n_g, exactly rate-proportional, integer-exact, no doubles.
    *
    * Two passes: a group-count aggregate (map-side combined) broadcast
    * back onto the stream, then a stateless per-row filter. The group
    * minimum is an empty-frame window over the ALREADY AGGREGATED
    * per-group frame (|groups| rows), never over the data.
    */
  def equalizeByKey(df: DataFrame, key: String, hashCol: String): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("__cnt"))
      .withColumn("__mn", min(col("__cnt")).over())
    df.join(broadcast(counts), key)
      .filter(
        conv(substring(md5(col(hashCol)), 1, 4), 16, 10).cast("long") * col("__cnt")
          < lit(65536L) * col("__mn"))
      .drop("__cnt", "__mn")
  }
}
