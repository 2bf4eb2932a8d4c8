package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal stub-seam specs: the payloads are fake, but the plumbing
  * (schema, determinism across partitionings, sample-before-decode) is the
  * real contract a codec swap must preserve.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)

  test("audio features are 13-dim, bounded, and match the payload bytes") {
    val audio = Multimodal.syntheticAudio(events, nStreams = 2L)
    val feats = Multimodal.extractAudioFeaturesStub(audio)
    val rows = feats.limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getSeq[Float](3)
      assert(f.length == 13)
      assert(f(0) >= 0f && f(0) <= 128f, s"energy out of range: ${f(0)}")
      assert(f(1) >= 0f && f(1) <= 1f, s"zcr out of range: ${f(1)}")
      assert(f.drop(2).forall(v => v >= 0f && v <= 128f))
    }
  }

  test("audio features are deterministic across partitionings") {
    def quantized(parts: Int) =
      Multimodal.extractAudioFeaturesStub(
        Multimodal.syntheticAudio(events, nStreams = 2L).repartition(parts))
        .select(col("stream_id"), col("chunk"),
          floor(element_at(col("features"), 1).cast("double") * 100).cast("long").as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(quantized(1) == quantized(7))
  }

  test("audio extraction rejects payloads without the GAU magic") {
    val s = spark
    import s.implicits._
    val bad = Seq(Multimodal.AudioRow(0L, 0L, 16000, Array[Byte](1, 2, 3, 4, 5))).toDS().toDF()
    val ex = intercept[Exception](Multimodal.extractAudioFeaturesStub(bad).collect())
    assert(ex.getMessage.contains("bad magic") ||
      Option(ex.getCause).exists(_.getMessage.contains("bad magic")))
  }

  test("frame decode is deterministic and sampling drops rows before decode") {
    val frames = Multimodal.syntheticFrames(events, nStreams = 2L)
    val sampled = Multimodal.sampleFrames(frames, every = 5)
    val total = frames.count()
    val kept = sampled.count()
    assert(kept < total && kept > 0)
    // quantize per row BEFORE summing: double-sum order is partition-dependent
    def luma(df: org.apache.spark.sql.DataFrame) = Multimodal.decodeStub(df)
      .agg(sum(floor(col("mean_luma") * 100).cast("long"))).collect()(0).getLong(0)
    assert(luma(sampled) == luma(sampled.repartition(5)))
  }

  test("RealCodecSeam preserves row count and (stream, frame) keys for any kernel") {
    val frames = Multimodal.syntheticFrames(events, nStreams = 2L)
    val out = RealCodecSeam.decodeAndFeaturize(frames, RealCodecSeam.identityKernel)
    assert(out.columns.toSeq ==
      Seq("stream_id", "frame", "width", "height", "features"))
    val inKeys = frames.select("stream_id", "frame")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val outKeys = out.select("stream_id", "frame")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outKeys == inKeys)
  }

  test("the seam's inference call is genuinely batched (featuresBatch sees groups)") {
    // a kernel that encodes the batch size it was invoked with into every
    // feature: if the seam degenerated to per-row calls, all values are 1
    val batchAware = new FrameKernel {
      def decode(payload: Array[Byte]): FrameKernel.DecodedFrame =
        FrameKernel.DecodedFrame(0, 0, payload)
      def features(frame: FrameKernel.DecodedFrame): Array[Float] =
        Array(1f) // deliberately wrong if used instead of featuresBatch
      override def featuresBatch(frames: Seq[FrameKernel.DecodedFrame]): Seq[Array[Float]] =
        frames.map(_ => Array(frames.length.toFloat))
    }
    val frames = Multimodal.syntheticFrames(events, nStreams = 2L).coalesce(1)
    val n = frames.count()
    val sizes = RealCodecSeam.decodeAndFeaturize(frames, batchAware, batch = 32)
      .select("features").collect().map(_.getSeq[Float](0).head.toLong)
    assert(sizes.count(_ == 32L) >= (n / 32) * 32,
      s"expected full 32-sized groups, got sizes ${sizes.distinct.toSeq}")
    assert(sizes.forall(s => s == 32L || s == n % 32), sizes.distinct.toSeq.toString)
  }
}
