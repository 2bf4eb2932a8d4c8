package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** n33's batch-split invariance and its stated 100 TB form. CCNet's
  * streamed state is the per-lang src0 bigram-count table — an
  * additive monoid (vocabulary-keyed, the n30 "corpus-shaped state"
  * class) — so HOW the ingest stream is cut into micro-batches must
  * not change any document's surprisal or tertile, and the streaming
  * result must equal batch t28 over the same corpus (whose DuckDB
  * oracle n33 shares verbatim, so this spec transitively pins the
  * streaming leg to the oracle too). CCNet scores are retroactive:
  * every arrival shifts the LM every other doc is scored against.
  */
class CcnetStreamSpec extends SparkSpec {

  test("n33: micro-batch splits don't change the result; streaming == batch t28") {
    val s = spark
    val docs = Tables.documents(s, sfDir)
      .select("doc_id", "source", "lang", "text")
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_ccnet_stream/p${ProcessHandle.current().pid()}")
    // 4 files + maxFilesPerTrigger=1 → 4 micro-batches; repartition
    // hash-scatters docs so every batch moves the LM counts and the
    // retroactive score drift across batches is real
    docs.repartition(4).write.mode("overwrite").parquet(dir)

    def run(fpt: Option[Int]): Seq[(Long, String, Long, Long, Long, Long)] =
      StreamingQueries.streamCcnet(s, dir, fpt)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(_._1).toSeq

    val multi = run(Some(1))
    val multiBatches = StreamingQueries.lastStreamBatches
    val single = run(None)
    val singleBatches = StreamingQueries.lastStreamBatches
    assert(multiBatches >= 3,
      s"staging did not split: $multiBatches input-bearing micro-batches")
    assert(singleBatches < multiBatches,
      s"control arm unexpectedly split too ($singleBatches vs $multiBatches)")

    val batch = graft.SparkEntry.queries("t28_ccnet_bucket")(s, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(multi == batch, "multi-batch streaming CCNet diverged from batch t28")
    assert(single == multi, "batch-split changed the streaming result")
    // all three tertiles must be populated per the dominant lang, or
    // the bucket column gates nothing
    assert(batch.map(_._6).toSet == Set(1L, 2L, 3L),
      "degenerate tertiles — fixture too small to gate anything")
  }

  test("n33 production arm (benchFn): streaming histogram tertiles == batch t28's benched arm") {
    // The BENCHED plan (r15 verdict #1): same ingest stream, but the
    // per-lang ntile window (a one-partition-per-lang sort — the
    // gate's measurement device) is replaced by t28's mergeable
    // histogram-tertile arm. The streamed per-doc surprisal table
    // equals batch t28's (test above), and both arms run the SAME
    // deterministic ccnetTertilesHist, so the results must be
    // IDENTICAL — which transitively inherits CcnetArmsSpec's
    // exact-vs-histogram agreement for the streaming leg too.
    val s = spark
    val nq = StreamingQueries.all.find(_.name == "n33_stream_ccnet").get
    val tq = TextQueries.all.find(_.name == "t28_ccnet_bucket").get
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("sur_sum"),
        r.getAs[Long]("avg_micro"), r.getAs[Long]("bucket")))
      .sortBy(_._1).toSeq
    val streamArm = rows(nq.benchFn.get(s, sfDir))
    val batchArm = rows(tq.benchFn.get(s, sfDir))
    assert(streamArm.nonEmpty, "empty production-arm result")
    assert(streamArm == batchArm,
      "streaming histogram-tertile arm diverged from batch t28's benched arm")
    assert(streamArm.map(_._6).toSet.size >= 2,
      "degenerate tertiles in the production arm")
  }

  test("n33's stated 100 TB form: update-mode LM-count upserts on RocksDB == the monoid state") {
    // The n28/n29/n31 demonstration for the CCNet fit: the per-(lang,
    // w1, w2) count state lives in RocksDB and the sink consumes
    // UPDATE-mode per-key upserts — the two pieces the catalog gate
    // (per-batch partials merged on read, byte-equal math) does not
    // itself exercise. The upsert stream applied key-by-key must land
    // on exactly the counts a batch aggregation computes.
    import org.apache.spark.sql.streaming.Trigger
    import graft.functions.TextFunctions.tokens
    val s = spark
    val docs = Tables.documents(s, sfDir)
      .select("doc_id", "source", "lang", "text").localCheckpoint(true)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_ccnet_upsert/p${ProcessHandle.current().pid()}")
    docs.repartition(4).write.mode("overwrite").parquet(dir)

    def pairCounts(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("source") === "src0")
      .select(col("lang"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("lang"),
        explode(transform(slice(col("tk"), lit(1), size(col("tk")) - 1),
          (t, i) => struct(t.as("w1"),
            element_at(col("tk"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c_b"))

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val upserted = scala.collection.mutable.Map.empty[(String, String, String), Long]
    val perBatchKeys = scala.collection.mutable.ArrayBuffer.empty[Set[(String, String, String)]]
    @volatile var rocksMetricSeen = false
    try {
      val stream = s.readStream.schema(StreamingQueries.ccnetStageSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val query = pairCounts(stream).writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
            .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
          this.synchronized {
            perBatchKeys += rows.map(_._1).toSet
            rows.foreach { case (k, v) => upserted(k) = v }
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
    assert(perBatchKeys.length >= 3, s"expected >=3 micro-batches, got ${perBatchKeys.length}")
    // the cross-batch supersede path must fire: common bigrams recur
    // across src0 docs in different batches
    val multi = perBatchKeys.flatten.groupBy(identity).count(_._2.size >= 2)
    assert(multi > 0, "no bigram key was upserted across multiple micro-batches")
    val batchCounts = pairCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(upserted.toMap == batchCounts,
      "update-mode upserts diverged from the batch LM counts")
  }
}
