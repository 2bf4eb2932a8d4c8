package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column operators.
  *
  * Media payloads are opaque BINARY columns with typed metadata — the
  * schema, partitioning, and batch iteration are real Spark plumbing; the
  * codec calls are STUBBED with deterministic fakes (this container has no
  * image/audio libraries — the reference itself stubs its CV pipeline with
  * randoms, covid_measures.py:253-256). A production deployment swaps
  * `decodeStub` for an FFI codec inside the same mapPartitions seam.
  *
  * Scale design: frames(stream_id, frame, format, width, height, data) is
  * partitioned by stream; decode/feature-extract run once per partition
  * with per-partition init (the model-broadcast pattern, SURVEY S10/M1),
  * never per row; samples are pushed down BEFORE decode so skipped frames
  * are never decoded (the det-interval knob, P2).
  */
object Multimodal {

  final case class FrameRow(
      stream_id: Long, frame: Long, format: String,
      width: Int, height: Int, data: Array[Byte])

  /** Deterministic fake frame payload: "GFT0" + w + h + seeded bytes.
    * Stands in for an H.264 NAL unit / JPEG blob. `nStreams` scales the
    * camera-fleet width with data volume (streams are the parallel axis;
    * per-stream length stays 600 frames).
    */
  def syntheticFrames(events: DataFrame, nStreams: Long = 4L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select((col("user_id") % nStreams).as("stream_id"), (col("event_id") % 600).as("frame"),
        col("event_id"))
      .groupBy("stream_id", "frame").agg(min("event_id").as("seed"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (sid, frame, seed) =>
          val w = 1280; val h = 720
          val data = new Array[Byte](64)
          data(0) = 'G'; data(1) = 'F'; data(2) = 'T'; data(3) = '0'
          var i = 4
          var s = seed * 6364136223846793005L + 1442695040888963407L
          while (i < 64) {
            s = s * 6364136223846793005L + 1442695040888963407L
            data(i) = (s >>> 56).toByte
            i += 1
          }
          FrameRow(sid, frame, "gft", w, h, data)
        }
      }
      .toDF()
  }

  /** Cadence sampling BEFORE decode (predicate pushes to the scan). */
  def sampleFrames(frames: DataFrame, every: Int): DataFrame =
    frames.filter(col("frame") % every === 0)

  /** STUB decode: parses the fake header and derives luma statistics from
    * the payload bytes. Real impl: codec FFI here, same signature.
    */
  def decodeStub(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.as[FrameRow]
      .mapPartitions { it =>
        // per-partition init seam (a real decoder/model loads ONCE here)
        it.map { f =>
          require(f.data.length >= 4 && f.data(0) == 'G' && f.data(1) == 'F', "bad magic")
          val luma = f.data.drop(4).map(b => (b & 0xff).toDouble).sum / (f.data.length - 4)
          (f.stream_id, f.frame, f.width, f.height, luma)
        }
      }
      .toDF("stream_id", "frame", "width", "height", "mean_luma")
  }

  /** STUB resize: metadata transform + payload passthrough (a real impl
    * rescales pixels; the plumbing — new dims, same partitioning — holds).
    */
  def resizeStub(frames: DataFrame, w: Int, h: Int): DataFrame =
    frames.withColumn("width", lit(w)).withColumn("height", lit(h))

  /** STUB feature extraction: binary -> dense float vector, seeded by the
    * payload (stands in for VGG16 4096-dim features, SURVEY M4).
    */
  def extractFeaturesStub(frames: DataFrame, dim: Int = 16): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.as[FrameRow]
      .mapPartitions { it =>
        it.map { f =>
          val vec = new Array[Float](dim)
          var s = f.data.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
          var i = 0
          while (i < dim) {
            s = s * 6364136223846793005L + 1442695040888963407L
            vec(i) = ((s >>> 40).toInt.toFloat / (1 << 24)) - 0.5f
            i += 1
          }
          (f.stream_id, f.frame, vec)
        }
      }
      .toDF("stream_id", "frame", "features")
  }
}
