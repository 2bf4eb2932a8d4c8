package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit-schema readers for the reference's file formats (SURVEY §2.1
  * S2-S5). Schemas are declared, never inferred — inference reads the data
  * twice and silently drifts types at scale.
  */
object CsvSources {

  /** S2: simulation scores CSV — `chunk_id,score_k0,...,score_k{n-1}`
    * (simulate.py:18-20).
    */
  def simScores(spark: SparkSession, path: String, numConfigs: Int): DataFrame = {
    val schema = StructType(
      StructField("chunk_id", LongType) +:
        (0 until numConfigs).map(i => StructField(s"score_$i", DoubleType)))
    spark.read.option("header", "true").schema(schema).csv(path)
  }

  /** S3: MOT ground-truth CSV (object_detection.py:17-18), with derived
    * right/bottom and frame-clipping (P4, object_detection.py:21-36).
    */
  def motGroundTruth(spark: SparkSession, path: String,
                     width: Int = 1280, height: Int = 720): DataFrame = {
    val schema = StructType(Seq(
      StructField("frame", LongType), StructField("id", IntegerType),
      StructField("bb_left", DoubleType), StructField("bb_top", DoubleType),
      StructField("bb_width", DoubleType), StructField("bb_height", DoubleType),
      StructField("conf", DoubleType), StructField("x", DoubleType),
      StructField("y", DoubleType), StructField("z", DoubleType)))
    spark.read.schema(schema).csv(path)
      .withColumn("bb_right", col("bb_left") + col("bb_width"))
      .withColumn("bb_bottom", col("bb_top") + col("bb_height"))
      .select(col("frame"), col("id"),
        greatest(lit(0.0), col("bb_left")).as("bb_left"),
        greatest(lit(0.0), col("bb_top")).as("bb_top"),
        least(lit(width.toDouble), col("bb_right")).as("bb_right"),
        least(lit(height.toDouble), col("bb_bottom")).as("bb_bottom"),
        col("conf"))
  }

  /** S4: SORT det.txt (frame,-1,x,y,w,h,score,...) with xywh→xyxy (P7)
    * and per-sequence id from the file path (sort.py:289-302).
    */
  def sortDetections(spark: SparkSession, glob: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("frame", LongType), StructField("neg", IntegerType),
      StructField("x", DoubleType), StructField("y", DoubleType),
      StructField("w", DoubleType), StructField("h", DoubleType),
      StructField("score", DoubleType)))
    spark.read.schema(schema).csv(glob)
      .withColumn("sequence",
        regexp_extract(input_file_name(), "([^/]+)/det/[^/]+$", 1))
      .select(col("sequence"), col("frame"),
        col("x").as("x1"), col("y").as("y1"),
        (col("x") + col("w")).as("x2"), (col("y") + col("h")).as("y2"), col("score"))
  }

  /** S8-shape decision-log sink: golden CSV with the reference's header
    * (simulate.py:23-24).
    */
  def writeDecisionLog(df: DataFrame, path: String): Unit =
    df.select(col("chunk_id"), col("config").as("chosen_config"),
        col("placement").as("chosen_placement"), col("cloud_cost"),
        col("runtime_s").as("runtime(s)"), col("score"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** P11: malformed-proc-log filter (knob_plan.py:266-269): drop short
    * rows, 'NA' runtimes, stray headers — over an S5-shaped log.
    */
  def cleanProcLog(raw: DataFrame): DataFrame =
    raw.filter(col("runtime").isNotNull && col("runtime") =!= "NA" &&
        !col("file_id").startsWith("file_id"))
      .withColumn("runtime_s", col("runtime").cast("double"))
      .filter(col("runtime_s").isNotNull)
}
