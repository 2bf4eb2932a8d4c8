package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end V-ETL streaming demo: frame parquet files stream in, the
  * pipeline (decode → detect stub → SORT tracking → 2 s quality windows)
  * runs continuously, per-chunk quality rows stream out.
  */
object VetlDemo {
  def main(args: Array[String]): Unit = {
    val Array(inDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val frames = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[graft.operators.Multimodal.FrameRow]].schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val tracks = graft.streaming.VetlPipeline.tracksFromFrames(frames)
    val quality = tracks
      .withColumn("ts", graft.streaming.VetlPipeline.frameTime(col("frame")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "2 seconds"), col("stream_id"))
      .agg(approx_count_distinct(col("track_id")).as("n_tracks"), count(lit(1)).as("n_boxes"))
    val q = quality.writeStream.format("memory").queryName("vetl_demo")
      .outputMode("append").start()
    q.processAllAvailable()
    val rows = spark.table("vetl_demo")
      .select(col("window.start").cast("string").as("start"), col("stream_id"), col("n_tracks"), col("n_boxes"))
      .orderBy("start", "stream_id").collect()
    rows.take(6).foreach(r => println(s"[vetl-demo] chunk=${r.getString(0)} stream=${r.getLong(1)} tracks=${r.getLong(2)} boxes=${r.getLong(3)}"))
    println(s"[vetl-demo] total closed windows: ${rows.length}")
    q.stop(); spark.stop()
  }
}
