package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** n31's batch-split invariance and its stated 100 TB form. DSIR's
  * streamed state is the raw/target bucket-count histogram pair — an
  * additive monoid — so HOW the ingest stream is cut into micro-batches
  * must not change any document's weight, rank or keep decision, and
  * the streaming result must equal batch t27 over the same corpus
  * (whose DuckDB oracle n31 shares verbatim, so this spec transitively
  * pins the streaming leg to the oracle too).
  */
class DsirStreamSpec extends SparkSpec {

  test("n31: micro-batch splits don't change the result; streaming == batch t27") {
    val s = spark
    val docs = Tables.documents(s, sfDir).select("doc_id", "text", "lang")
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_dsir_stream/p${ProcessHandle.current().pid()}")
    // 4 files + maxFilesPerTrigger=1 → 4 micro-batches; repartition
    // hash-scatters docs so every batch moves BOTH histograms and the
    // retroactive log-ratio drift across batches is real
    docs.repartition(4).write.mode("overwrite").parquet(dir)

    def run(fpt: Option[Int]): Seq[(Long, Long, Long, Long, Long)] =
      StreamingQueries.streamDsir(s, dir, fpt)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq

    val multi = run(Some(1))
    val multiBatches = StreamingQueries.lastStreamBatches
    val single = run(None)
    val singleBatches = StreamingQueries.lastStreamBatches
    assert(multiBatches >= 3,
      s"staging did not split: $multiBatches input-bearing micro-batches")
    assert(singleBatches < multiBatches,
      s"control arm unexpectedly split too ($singleBatches vs $multiBatches)")

    val batch = graft.SparkEntry.queries("t27_dsir_weights")(s, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(multi == batch, "multi-batch streaming DSIR diverged from batch t27")
    assert(single == multi, "batch-split changed the streaming result")
    // the fixture must exercise a real selection: some docs kept, some not
    assert(batch.exists(_._5 == 1L) && batch.exists(_._5 == 0L),
      "degenerate keep column — fixture too small to gate anything")
  }

  test("n31 production arm (benchFn): streaming histogram keep == batch t27's benched arm") {
    // The BENCHED plan (r15 verdict #1): same ingest stream + dc ⋈ lr
    // assembly, but the exact global resampling rank (a
    // single-partition window — the gate's measurement device) is
    // replaced by t27's mergeable histogram-threshold keep. The
    // streamed weight table equals batch t27's (test above), and both
    // arms run the SAME deterministic dsirHistKeep, so the results
    // must be IDENTICAL — which transitively inherits DsirSpec's
    // exact-vs-histogram agreement for the streaming leg too.
    val s = spark
    val nq = StreamingQueries.all.find(_.name == "n31_stream_dsir").get
    val tq = TextQueries.all.find(_.name == "t27_dsir_weights").get
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("w_micro"), r.getAs[Long]("keep")))
      .sortBy(_._1).toSeq
    val streamArm = rows(nq.benchFn.get(s, sfDir))
    val batchArm = rows(tq.benchFn.get(s, sfDir))
    assert(streamArm.nonEmpty, "empty production-arm result")
    assert(streamArm == batchArm,
      "streaming histogram-keep arm diverged from batch t27's benched arm")
    assert(streamArm.map(_._4).toSet == Set(0L, 1L),
      "degenerate keep column in the production arm")
  }

  test("n31's stated 100 TB form: update-mode histogram upserts on RocksDB == the monoid state") {
    // The n28/n29 demonstration for the DSIR fit: the 256-key histogram
    // state lives in RocksDB and the sink consumes UPDATE-mode per-bucket
    // upserts — the two pieces the catalog gate (complete mode + memory
    // sink, bounded replay) does not itself exercise. The upsert stream
    // applied bucket-by-bucket must land on exactly the histograms a
    // batch aggregation computes.
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sfDir).select("doc_id", "text", "lang")
      .localCheckpoint(true)
    val dir = graft.sources.TmpDirs.scratch(
      s"/tmp/graft_dsir_upsert/p${ProcessHandle.current().pid()}")
    docs.repartition(4).write.mode("overwrite").parquet(dir)

    def bucket(pair: org.apache.spark.sql.Column) =
      (conv(substring(md5(pair), 1, 8), 16, 10).cast("long") % 256).as("b")

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val upserted = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val perBatchKeys = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    @volatile var rocksMetricSeen = false
    try {
      val stream = s.readStream.schema(StreamingQueries.dsirStageSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("doc_id").cast("long"), col("text"), col("lang"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          val wordRe = java.util.regex.Pattern.compile("[a-z0-9]+")
          it.flatMap { case (_, text, lang) =>
            val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
            val toks = scala.collection.mutable.ArrayBuffer.empty[String]
            while (m.find()) toks += m.group()
            val isT = if (lang == "en") 1L else 0L
            (0 until math.max(0, toks.length - 1)).iterator
              .map(i => (toks(i) + " " + toks(i + 1), isT))
          }
        }
        .toDF("pair", "is_t")
      val hist = stream.select(bucket(col("pair")), col("is_t"))
        .groupBy("b")
        .agg(count(lit(1)).as("c_r"), sum("is_t").as("c_t"))
      val query = hist.writeStream
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect()
            .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
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
    // the cross-batch supersede path must actually fire: with 256
    // buckets and thousands of bigrams per file, every batch touches
    // most buckets — some bucket MUST be upserted in 2+ batches
    val multi = perBatchKeys.flatten.groupBy(identity).count(_._2.size >= 2)
    assert(multi > 0, "no bucket was upserted across multiple micro-batches")
    // the upsert sink's final keyed state == the batch histograms
    val batchHist = graft.operators.Dedup.adjacentPairs(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(bucket(col("pair")),
        (col("lang") === "en").cast("long").as("is_t"))
      .groupBy("b")
      .agg(count(lit(1)).as("c_r"), sum("is_t").as("c_t"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(upserted.toMap == batchHist,
      "update-mode upserts diverged from the batch histograms")
  }
}
