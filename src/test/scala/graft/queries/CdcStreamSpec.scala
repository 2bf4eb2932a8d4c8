package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** n28's STATED 100 TB form, demonstrated (r11 verdict #6): the
  * latest-wins keyed state lives in RocksDB
  * (`RocksDBStateStoreProvider`) and the sink consumes UPDATE-mode
  * per-key upserts instead of a complete-mode table — the only two
  * pieces the catalog gate (complete mode + memory sink, bounded replay)
  * does not itself exercise. The upsert stream applied key-by-key must
  * land on exactly the complete-mode/batch state, and the merged
  * snapshot must equal q49's batch result (whose oracle n28 shares
  * verbatim).
  */
class CdcStreamSpec extends SparkSpec {

  private val stageSchema = StructType(Seq(
    StructField("o_custkey", LongType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  test("n28 update-mode upserts on RocksDB state == complete-mode CDC state") {
    val s = spark
    val log = Tables.orders(s, sfDir).select("o_custkey", "o_orderdate",
      "o_orderkey", "o_orderstatus", "o_totalprice")
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_cdc_update/p${ProcessHandle.current().pid()}")
    // 4 files + maxFilesPerTrigger=1 → 4 micro-batches, so later changes
    // genuinely SUPERSEDE earlier upserts in the sink
    log.repartition(4).write.mode("overwrite").parquet(dir)

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the upsert sink: a keyed table where each update-mode row REPLACES
    // the key's value — the RocksDB-backed 100 TB sink contract in
    // miniature (a deployment writes the same rows to a KV store / MERGE
    // target instead of a driver map)
    val upserted = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val perBatchKeys = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    @volatile var rocksMetricSeen = false
    try {
      val ch = RelationalQueries.cdcChangeStruct(
        s.readStream.schema(stageSchema).option("maxFilesPerTrigger", "1").parquet(dir))
      val latest = ch.groupBy("key").agg(max(col("ch")).as("last"))
      val query = latest
        .select(col("key"), col("last.op").as("op"), col("last.new_bal").as("new_bal"))
        .writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          this.synchronized {
            perBatchKeys += rows.map(_._1).toSet
            rows.foreach { case (k, op, bal) => upserted(k) = (op, bal) }
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val prog = query.lastProgress
      rocksMetricSeen = prog != null && prog.stateOperators.nonEmpty &&
        prog.stateOperators.exists(_.customMetrics.keySet().toArray
          .exists(_.toString.startsWith("rocksdb")))
    } finally prevProvider match {
      case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    assert(rocksMetricSeen, "state operator did not report RocksDB metrics — provider not engaged")
    assert(perBatchKeys.length >= 3, s"expected ≥3 micro-batches, got ${perBatchKeys.length}")
    // the supersede path must actually fire: some key upserted in 2+ batches
    val multi = perBatchKeys.flatten.groupBy(identity).count(_._2.length >= 2)
    assert(multi > 0, "no key was upserted across multiple micro-batches")

    // (a) the upsert sink's final keyed state == the batch latest-wins
    // compaction (which the complete-mode gate + DuckDB oracle already pin)
    val batchLatest = RelationalQueries
      .cdcChangeStruct(Tables.orders(s, sfDir))
      .groupBy("key").agg(max(col("ch")).as("last"))
      .select(col("key"), col("last.op"), col("last.new_bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(upserted.toMap == batchLatest)

    // (b) merging the upserted state onto the snapshot == q49's batch
    // result — streaming-update, complete-mode, batch, and the SQL oracle
    // all four agree
    import s.implicits._
    val lastDf = upserted.toSeq.map { case (k, (op, bal)) => (k, op, bal) }
      .toDF("key", "op", "new_bal")
      .select(col("key"), struct(lit(null).cast("timestamp_ntz").as("o_orderdate"),
        lit(null).cast("long").as("o_orderkey"), col("op"), col("new_bal")).as("last"))
    val merged = RelationalQueries.cdcMerge(
        RelationalQueries.cdcSnapshot(s, sfDir), lastDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val q49 = RelationalQueries.all.find(_.name == "q49_cdc_upsert").get
      .fn(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(merged == q49)
  }
}
