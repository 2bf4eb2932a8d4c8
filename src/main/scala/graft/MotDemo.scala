package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end MOT pipeline demo: det.txt files -> explicit-schema scan ->
  * xywh conversion -> SORT tracking per sequence (reference Q2's data path).
  */
object MotDemo {
  def main(args: Array[String]): Unit = {
    val Array(glob) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dets = graft.sources.CsvSources.sortDetections(spark, glob)
      .withColumn("stream_id", abs(xxhash64(col("sequence"))) % 1000000)
    val tracks = graft.operators.Tracking.track(
      dets.select("stream_id", "frame", "x1", "y1", "x2", "y2", "score"))
    val summary = tracks.groupBy("stream_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("track_id")).as("ids"))
      .collect()
    summary.foreach(r => println(s"[mot-demo] stream=${r.getLong(0)} rows=${r.getLong(1)} ids=${r.getLong(2)}"))
    // DLT: calibrate from synthetic correspondences, report error
    val p = breeze.linalg.DenseMatrix((800.0,0.0,640.0,100.0),(0.0,800.0,360.0,50.0),(0.0,0.0,1.0,2.0))
    val world = for (x <- 0 to 2; y <- 0 to 2; z <- 0 to 1) yield (x*1.5, y*2.0, z+0.5)
    val pixel = world.map { case (x,y,z) =>
      val v = p * breeze.linalg.DenseVector(x,y,z,1.0); (v(0)/v(2), v(1)/v(2)) }
    val (_, err) = graft.ops.Dlt.calibrate(world, pixel)
    println(f"[mot-demo] dlt reprojection error: $err%.2e px")
    spark.stop()
  }
}
