package graft.ops

import org.apache.spark.sql.DataFrame

/** Checkpoint helpers shared by the iterative / multi-consumer operators. */
object Checkpoints {

  /** localCheckpoint that KEEPS the frame's hash partitioning. Under AQE
    * (the default), `Dataset.localCheckpoint` captures the partitioning
    * from an un-executed AdaptiveSparkPlan — i.e. none — so every
    * consumer re-shuffles the checkpointed data (measured on q40: the
    * static node list was re-exchanged in all 5 iterations, 10 exchanges
    * where the design says 5, and no runtime exchange reuse either).
    * Capturing the checkpoint with AQE momentarily off stores the real
    * hashpartitioning in the LogicalRDD; consumers (AQE back on) then
    * meet their distribution requirements exchange-free. Driver-side
    * conf flip around an eager one-off materialization — no concurrent
    * query in this session sees it.
    */
  def partitioned(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val k = "spark.sql.adaptive.enabled"
    val prev = conf.get(k)
    conf.set(k, "false")
    try df.localCheckpoint() finally conf.set(k, prev)
  }
}
