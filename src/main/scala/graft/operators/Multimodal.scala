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

  final case class AudioRow(
      stream_id: Long, chunk: Long, sample_rate: Int, data: Array[Byte])

  /** Deterministic fake PCM chunk: "GAU0" + seeded 8-bit samples — the
    * audio half of the extraction pipeline (reference:
    * workloads/streaming/runtime.py:47-61, video→wav via ffmpeg; here
    * the payload is an opaque BINARY column like the frames).
    */
  def syntheticAudio(events: DataFrame, nStreams: Long = 4L,
                     chunkBytes: Int = 256): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select((col("user_id") % nStreams).as("stream_id"),
        (col("event_id") % 600).as("chunk"), col("event_id"))
      .groupBy("stream_id", "chunk").agg(min("event_id").as("seed"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        it.map { case (sid, chunk, seed) =>
          val data = new Array[Byte](chunkBytes)
          data(0) = 'G'; data(1) = 'A'; data(2) = 'U'; data(3) = '0'
          var s = seed * 2862933555777941757L + 3037000493L
          var i = 4
          while (i < chunkBytes) {
            s = s * 2862933555777941757L + 3037000493L
            data(i) = (s >>> 56).toByte
            i += 1
          }
          AudioRow(sid, chunk, 16000, data)
        }
      }
      .toDF()
  }

  /** STUB audio feature extraction (reference audio_to_text seam,
    * runtime.py:56-61): per-partition init (a real impl loads the
    * recognizer/librosa model ONCE here), then per-chunk deterministic
    * energy / zero-crossing / band statistics from the payload bytes —
    * the MFCC-shaped (13-dim) contract without codec libraries.
    */
  def extractAudioFeaturesStub(audio: DataFrame, dim: Int = 13): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.as[AudioRow]
      .mapPartitions { it =>
        // per-partition init seam (decoder/model loads once here)
        it.map { a =>
          require(a.data.length >= 4 && a.data(0) == 'G' && a.data(1) == 'A', "bad magic")
          val pcm = a.data.drop(4).map(b => (b & 0xff) - 128.0)
          val energy = math.sqrt(pcm.map(x => x * x).sum / pcm.length)
          var zc = 0
          var i = 1
          while (i < pcm.length) { if (pcm(i - 1) * pcm(i) < 0) zc += 1; i += 1 }
          val feats = new Array[Float](dim)
          feats(0) = energy.toFloat
          feats(1) = zc.toFloat / pcm.length
          var d = 2
          while (d < dim) {
            // banded absolute means stand in for cepstral coefficients
            val band = pcm.indices.filter(_ % (dim - 2) == (d - 2)).map(j => math.abs(pcm(j)))
            feats(d) = (band.sum / band.length).toFloat
            d += 1
          }
          (a.stream_id, a.chunk, a.sample_rate, feats)
        }
      }
      .toDF("stream_id", "chunk", "sample_rate", "features")
  }

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
