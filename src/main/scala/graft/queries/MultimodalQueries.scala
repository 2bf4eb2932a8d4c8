package graft.queries

import graft.{Q, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal pipeline catalog: binary frame columns with typed metadata,
  * cadence sampling pushed before decode, stubbed decode/feature-extract
  * inside mapPartitions seams (SURVEY S1/S10/M1/M4/P8).
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // full pipeline: synthesize -> sample (P2, BEFORE decode) -> decode ->
    // per-stream luma statistics.
    Q("m01_decode_pipeline",
      (s, d) => {
        // stream count scales with volume (count/2500, as in ControlQueries)
        val nStreams = math.max(Tables.eventCount(s, d) / 2500L, 1L)
        val frames = Multimodal.syntheticFrames(Tables.events(s, d), nStreams)
        val sampled = Multimodal.sampleFrames(frames, every = 5)
        Multimodal.decodeStub(sampled)
          .groupBy("stream_id")
          .agg(count(lit(1)).as("n_frames"),
            round(sum("mean_luma"), 2).as("sum_luma"),
            max("width").as("width"), max("height").as("height"))
          .orderBy("stream_id")
      },
      // deterministic synthetic payloads + stub decode → literal sf0.01
      // gate golden (stability-checked across 4/8/16-core runs)
      Some("""SELECT stream_id::BIGINT AS stream_id, n_frames::BIGINT AS n_frames,
             |       sum_luma, width, height FROM (VALUES
             |  (0, 119, 15155.77, 1280, 720), (1, 120, 15450.52, 1280, 720),
             |  (2, 120, 15291.62, 1280, 720), (3, 119, 15166.65, 1280, 720)
             |) t(stream_id, n_frames, sum_luma, width, height)""".stripMargin)),

    // feature extraction over resized frames -> per-stream quantized
    // feature-norm aggregate (M4's 4096-dim features, stub dim=16).
    Q("m02_frame_features",
      (s, d) => {
        val nStreams = math.max(Tables.eventCount(s, d) / 2500L, 1L)
        val frames = Multimodal.resizeStub(
          Multimodal.sampleFrames(
            Multimodal.syntheticFrames(Tables.events(s, d), nStreams), every = 10),
          640, 360)
        Multimodal.extractFeaturesStub(frames)
          .select(col("stream_id"),
            aggregate(transform(col("features"),
              x => floor(x.cast("double") * 1000).cast("long")),
              lit(0L), (a, x) => a + abs(x)).as("l1_norm_q"))
          .groupBy("stream_id")
          .agg(count(lit(1)).as("n_frames"), sum("l1_norm_q").cast("long").as("total_l1_q"))
          .orderBy("stream_id")
      },
      Some("""SELECT stream_id::BIGINT AS stream_id, n_frames::BIGINT AS n_frames,
             |       total_l1_q::BIGINT AS total_l1_q FROM (VALUES
             |  (0, 59, 234647), (1, 60, 236769), (2, 60, 242756), (3, 60, 246212)
             |) t(stream_id, n_frames, total_l1_q)""".stripMargin)),

    // S12 audio half of the extraction pipeline: synthetic PCM chunks ->
    // stubbed MFCC-shaped features -> per-stream quantized energy /
    // zero-crossing aggregates (reference runtime.py:47-61 audio seam).
    Q("m03_audio_features",
      (s, d) => {
        val nStreams = math.max(Tables.eventCount(s, d) / 2500L, 1L)
        val audio = Multimodal.syntheticAudio(Tables.events(s, d), nStreams)
        Multimodal.extractAudioFeaturesStub(audio)
          .select(col("stream_id"),
            floor(element_at(col("features"), 1).cast("double") * 100).cast("long").as("energy_q"),
            floor(element_at(col("features"), 2).cast("double") * 100000).cast("long").as("zcr_q"))
          .groupBy("stream_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum("energy_q").as("sum_energy_q"),
            sum("zcr_q").as("sum_zcr_q"))
          .orderBy("stream_id")
      },
      // deterministic stub → literal sf0.01 gate golden
      // (stability-checked across 4/8/16-core runs)
      Some("""SELECT stream_id::BIGINT AS stream_id, n_chunks::BIGINT AS n_chunks,
             |       sum_energy_q::BIGINT AS sum_energy_q, sum_zcr_q::BIGINT AS sum_zcr_q
             |FROM (VALUES
             |  (0, 597, 4410316, 29594553), (1, 596, 4401650, 29605262),
             |  (2, 598, 4414286, 29497728), (3, 594, 4390892, 29314404)
             |) t(stream_id, n_chunks, sum_energy_q, sum_zcr_q)""".stripMargin)),

    // Scene-cut KEYFRAME selection — the sampling stage between decode
    // and feature-extract a real video pipeline runs (shot-boundary
    // detection on frame-statistic deltas; reference cadence sampling is
    // the degenerate fixed-stride form, covid_measures.py:271-277). A
    // frame is a keyframe iff it opens the stream or its mean luma jumps
    // more than a threshold vs the previous frame — one lag window per
    // stream, state O(1) per stream, the same shape the streaming tracker
    // partitions by. Downstream (detector, feature extract) then runs on
    // the keyframes only: content-adaptive decimation instead of m01's
    // fixed stride.
    Q("m04_scene_cuts",
      (s, d) => {
        val nStreams = math.max(Tables.eventCount(s, d) / 2500L, 1L)
        val lumas = Multimodal.decodeStub(
          Multimodal.syntheticFrames(Tables.events(s, d), nStreams))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("stream_id").orderBy("frame")
        val keyed = lumas
          .withColumn("prev", lag("mean_luma", 1).over(w))
          .withColumn("is_key",
            col("prev").isNull || abs(col("mean_luma") - col("prev")) > 12.0)
        keyed.filter(col("is_key"))
          .groupBy("stream_id")
          .agg(count(lit(1)).as("n_keyframes"),
            min("frame").as("first_key"), max("frame").as("last_key"),
            floor(sum("mean_luma") * 100).cast("long").as("sum_luma_q"))
          .join(keyed.groupBy("stream_id").agg(count(lit(1)).as("n_frames")), "stream_id")
          .select("stream_id", "n_frames", "n_keyframes", "first_key", "last_key", "sum_luma_q")
          .orderBy("stream_id")
      },
      // deterministic synthetic payloads + stub decode → literal sf0.01
      // gate golden (stability-checked across 4/8/16-core runs)
      Some("""SELECT stream_id::BIGINT AS stream_id, n_frames::BIGINT AS n_frames,
             |  n_keyframes::BIGINT AS n_keyframes, first_key::BIGINT AS first_key,
             |  last_key::BIGINT AS last_key, sum_luma_q::BIGINT AS sum_luma_q
             |FROM (VALUES
             |  (0, 597, 250, 0, 592, 3183021), (1, 596, 231, 0, 596, 2931473),
             |  (2, 598, 234, 0, 594, 2988326), (3, 594, 226, 0, 597, 2856996)
             |) t(stream_id, n_frames, n_keyframes, first_key, last_key, sum_luma_q)""".stripMargin)),

    // The COMPOSITE V-ETL pipeline (SURVEY Q1/Q3) as one BATCH gate:
    // synthesize → detect (stub seam) → SORT tracking → 2 s event-time
    // quality windows, integer-exact aggregates. The committed golden
    // this produces is ALSO the oracle of n23_vetl_stream — the
    // Structured-Streaming twin runs the identical composition through
    // trackStream's FMGWS state, so the pair checks batch == streaming
    // over the full pipeline, not just per stage (the n01/n15 pattern).
    // Sentinel frames (far-future, past the cutoff on both twins) exist
    // so the streaming twin's append-mode windows all close.
    Q("m05_vetl_pipeline",
      (s, d) => {
        val frames = graft.streaming.VetlPipeline.withSentinels(
          Multimodal.syntheticFrames(Tables.events(s, d), nStreams = 4L))
        val dets = graft.streaming.VetlPipeline.detectStub(frames)
        val scores = dets.groupBy("stream_id", "frame").agg(avg("score").as("score"))
        val tracks = graft.operators.Tracking.track(dets)
        graft.streaming.VetlPipeline
          .qualityGateWindows(tracks, scores,
            graft.streaming.VetlPipeline.epochMs + 600000L)
          .orderBy("stream_id", "chunk_start")
      },
      Some("""SELECT * FROM read_csv(
             |  '/root/repo/src/test/resources/golden_m05_vetl_quality.csv',
             |  header=true, columns={'chunk_start':'VARCHAR','stream_id':'BIGINT',
             |    'n_tracks':'BIGINT','n_boxes':'BIGINT','score_micro':'BIGINT'})""".stripMargin))
  )
}
