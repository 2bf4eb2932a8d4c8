package graft.streaming

import graft.SparkSpec
import graft.operators.Tracking
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  import graft.operators.Tracking.DetRow

  private def detFrames(stream: Long, frames: Range): Seq[DetRow] =
    frames.flatMap { f =>
      Seq(
        DetRow(stream, f, 100 + 3.0 * f, 200 + 2.0 * f, 160 + 3.0 * f, 280 + 2.0 * f, 0.9),
        DetRow(stream, f, 700 - 2.0 * f, 400, 760 - 2.0 * f, 480, 0.9))
    }

  test("streaming tracker matches batch tracker on the same detections") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[DetRow]
    val query = StreamingOps.trackStream(input.toDF())
      .writeStream.format("memory").queryName("tracks_stream")
      .outputMode("append").start()
    try {
      input.addData(detFrames(0, 0 until 12))
      query.processAllAvailable()
      val streaming = spark.table("tracks_stream")
        .orderBy("frame", "track_id")
        .collect().map(r => (r.getLong(1), r.getInt(2), math.rint(r.getDouble(3))))
      val batch = Tracking.track(detFrames(0, 0 until 12).toDF())
        .orderBy("frame", "track_id")
        .collect().map(r => (r.getLong(1), r.getInt(2), math.rint(r.getDouble(3))))
      assert(streaming.nonEmpty)
      assert(streaming.toSeq == batch.toSeq)
    } finally query.stop()
  }

  test("tracker results are state-store-provider independent (RocksDB == HDFS-backed)") {
    // the production deployment runs RocksDB for large state (bounded
    // native memory, incremental checkpoints); results must not depend on
    // which provider holds the kryo'd tracker state
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val confKey = "spark.sql.streaming.stateStore.providerClass"
    def run(provider: Option[String], tag: String): Seq[(Long, Int, Double)] = {
      val prev = spark.conf.getOption(confKey)
      provider.foreach(spark.conf.set(confKey, _))
      try {
        val input = MemoryStream[DetRow]
        val name = s"tracks_prov_$tag"
        val query = StreamingOps.trackStream(input.toDF())
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          input.addData(detFrames(3, 0 until 6))
          query.processAllAvailable()
          input.addData(detFrames(3, 6 until 12))
          query.processAllAvailable()
          spark.table(name).orderBy("frame", "track_id")
            .collect().map(r => (r.getLong(1), r.getInt(2), math.rint(r.getDouble(3)))).toSeq
        } finally query.stop()
      } finally {
        prev match {
          case Some(v) => spark.conf.set(confKey, v)
          case None => spark.conf.unset(confKey)
        }
      }
    }
    val rocks = run(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), "rocks")
    val hdfs = run(None, "hdfs")
    assert(rocks.nonEmpty && rocks == hdfs)
  }

  test("tracker state persists across micro-batches (ids stay stable)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[DetRow]
    val query = StreamingOps.trackStream(input.toDF())
      .writeStream.format("memory").queryName("tracks_two_batches")
      .outputMode("append").start()
    try {
      input.addData(detFrames(7, 0 until 8))
      query.processAllAvailable()
      input.addData(detFrames(7, 8 until 16))
      query.processAllAvailable()
      val rows = spark.table("tracks_two_batches").collect()
        .map(r => (r.getLong(1), r.getInt(2)))
      val idsFirst = rows.filter(_._1 < 8).map(_._2).distinct.sorted
      val idsSecond = rows.filter(_._1 >= 8).map(_._2).distinct.sorted
      assert(idsFirst.nonEmpty && idsFirst.toSeq == idsSecond.toSeq,
        s"track ids changed across batches: $idsFirst vs $idsSecond")
    } finally query.stop()
  }

  test("late frames across micro-batches are dropped without corrupting state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[DetRow]
    val query = StreamingOps.trackStream(input.toDF())
      .writeStream.format("memory").queryName("tracks_late_frames")
      .outputMode("append").start()
    try {
      input.addData(detFrames(2, 0 until 8))
      query.processAllAvailable()
      // frames 4-5 arrive AGAIN in the next batch (out-of-order delivery);
      // the guard must drop them without regressing lastFrame, so 8-11
      // continue the same tracks as a clean sequential run
      input.addData(detFrames(2, 4 until 6) ++ detFrames(2, 8 until 12))
      query.processAllAvailable()
      val streaming = spark.table("tracks_late_frames")
        .orderBy("frame", "track_id")
        .collect().map(r => (r.getLong(1), r.getInt(2), math.rint(r.getDouble(3))))
      val batch = Tracking.track(detFrames(2, 0 until 12).toDF())
        .orderBy("frame", "track_id")
        .collect().map(r => (r.getLong(1), r.getInt(2), math.rint(r.getDouble(3))))
      assert(streaming.nonEmpty)
      assert(streaming.toSeq == batch.toSeq,
        "late frames corrupted tracker state")
    } finally query.stop()
  }

  test("streaming switcher decisions match the batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    import graft.control._
    val profiles = IndexedSeq(
      Profile(0, 0, 1.9, 0.0, 100), Profile(1, 0, 1.4, 4.0, 100),
      Profile(2, 1, 1.5, 0.0, 80), Profile(3, 1, 0.8, 6.0, 80),
      Profile(4, 2, 1.2, 0.0, 60), Profile(5, 2, 0.7, 4.0, 60))
    val centers = Array(Array(0.2, 0.25, 0.15), Array(0.5, 0.55, 0.45), Array(0.8, 0.85, 0.75))
    def mk() = {
      val buffer = new SimBuffer(400.0, profiles.map(p => p.knobConfig -> p.sizeBytes).toMap)
      val planner = new KnobPlanner(centers, Array(1.9, 1.5, 1.2), 24.0, 2.0)
      new Switcher(centers, profiles, planner, 100, 24 * 3600 * 2 + 100.0,
        Array(0.86, 0.053, 0.086), buffer)
    }
    val chunks = (0 until 150).map { i =>
      val base = if (i < 50) 0.2 else if (i < 100) 0.8 else 0.5
      (5L, i.toLong, base, base * 0.8 + 0.1, base * 0.5)
    }

    val input = MemoryStream[(Long, Long, Double, Double, Double)]
    val query = StreamingOps.switchStream(
        input.toDF().toDF("stream_id", "chunk_id", "s0", "s1", "s2"), mk _)
      .writeStream.format("memory").queryName("switch_stream")
      .outputMode("append").start()
    try {
      input.addData(chunks.take(75))
      query.processAllAvailable()
      input.addData(chunks.drop(75))
      query.processAllAvailable()
      val streaming = spark.table("switch_stream").orderBy("chunk_id")
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(6)))
      val batch = Replay.skyscraper(
          chunks.iterator.map(c => (c._2, Array(c._3, c._4, c._5))), mk())
        .map(l => (l.chunkId, l.chosenConfig, l.chosenPlacement, l.score)).toSeq
      assert(streaming.length == 150)
      assert(streaming.toSeq == batch)
    } finally query.stop()
  }

  test("late chunks across micro-batches are dropped without corrupting switcher state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    import graft.control._
    val profiles = IndexedSeq(
      Profile(0, 0, 1.9, 0.0, 100), Profile(1, 0, 1.4, 4.0, 100),
      Profile(2, 1, 1.5, 0.0, 80), Profile(3, 1, 0.8, 6.0, 80),
      Profile(4, 2, 1.2, 0.0, 60), Profile(5, 2, 0.7, 4.0, 60))
    val centers = Array(Array(0.2, 0.25, 0.15), Array(0.5, 0.55, 0.45), Array(0.8, 0.85, 0.75))
    def mk() = {
      val buffer = new SimBuffer(400.0, profiles.map(p => p.knobConfig -> p.sizeBytes).toMap)
      val planner = new KnobPlanner(centers, Array(1.9, 1.5, 1.2), 24.0, 2.0)
      new Switcher(centers, profiles, planner, 100, 24 * 3600 * 2 + 100.0,
        Array(0.86, 0.053, 0.086), buffer)
    }
    val chunks = (0 until 120).map { i =>
      val base = if (i < 60) 0.3 else 0.7
      (9L, i.toLong, base, base * 0.8 + 0.1, base * 0.5)
    }

    val input = MemoryStream[(Long, Long, Double, Double, Double)]
    val query = StreamingOps.switchStream(
        input.toDF().toDF("stream_id", "chunk_id", "s0", "s1", "s2"), mk _)
      .writeStream.format("memory").queryName("switch_late")
      .outputMode("append").start()
    try {
      input.addData(chunks.take(60))
      query.processAllAvailable()
      // chunks 30-39 arrive AGAIN (late) alongside the genuine tail
      input.addData(chunks.slice(30, 40) ++ chunks.drop(60))
      query.processAllAvailable()
      val streaming = spark.table("switch_late").orderBy("chunk_id")
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(6)))
      val batch = Replay.skyscraper(
          chunks.iterator.map(c => (c._2, Array(c._3, c._4, c._5))), mk())
        .map(l => (l.chunkId, l.chosenConfig, l.chosenPlacement, l.score)).toSeq
      assert(streaming.length == 120, s"late chunks re-emitted: ${streaming.length}")
      assert(streaming.toSeq == batch)
    } finally query.stop()
  }

  test("streaming dedup drops same-content docs across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = StreamingOps.dedupStream(
        input.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (t(0), 0L, "the quick brown fox"),
        (t(1), 1L, "a completely different doc"),
        (t(2), 2L, "the quick brown fox"))) // dup within batch
      query.processAllAvailable()
      input.addData(Seq(
        (t(3), 3L, "THE QUICK   brown fox!!"), // dup after normalization
        (t(4), 4L, "a third novel document")))
      query.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(0L, 1L, 4L), s"kept $kept")
    } finally query.stop()
  }

  test("windowed quality with watermark aggregates event-time windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val query = StreamingOps.windowedQuality(
        input.toDF().toDF("ts", "stream_id", "score"))
      .writeStream.format("memory").queryName("windowed_quality")
      .outputMode("append").start()
    try {
      val rows = (0 until 20).map { i =>
        (new java.sql.Timestamp(base.getTime + i * 500L), (i % 2).toLong, 0.5)
      }
      input.addData(rows)
      query.processAllAvailable()
      // advance watermark far enough to close all windows
      input.addData(Seq((new java.sql.Timestamp(base.getTime + 60000L), 0L, 0.0)))
      query.processAllAvailable()
      val out = spark.table("windowed_quality").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      assert(out.nonEmpty)
      // 20 rows over 10s in 2s windows: 5 windows x 2 streams, 2 rows each
      assert(out.count(_._3 == 2L) == 10, s"got ${out.toSeq}")
    } finally query.stop()
  }
}
