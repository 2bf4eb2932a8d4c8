package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Console demo: SORT tracking over a file-based detection stream
  * (the live-ingestion path, SURVEY Q3 re-architected).
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val Array(inDir) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(
      StructField("stream_id", LongType), StructField("frame", LongType),
      StructField("x1", DoubleType), StructField("y1", DoubleType),
      StructField("x2", DoubleType), StructField("y2", DoubleType),
      StructField("score", DoubleType)))
    val dets = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = graft.streaming.StreamingOps.trackStream(dets)
      .writeStream.format("memory").queryName("demo_tracks")
      .outputMode("append").start()
    q.processAllAvailable()
    val n = spark.table("demo_tracks").count()
    val ids = spark.table("demo_tracks").select("track_id").distinct().count()
    println(s"[stream-demo] tracked rows=$n distinct_ids=$ids")
    q.stop(); spark.stop()
  }
}
