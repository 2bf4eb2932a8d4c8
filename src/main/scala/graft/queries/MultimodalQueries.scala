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
          // mean_luma = (integer byte sum)/60.0; ×60 + round recovers the
          // byte sum EXACTLY, so the aggregate is an order-free long sum
          .agg(count(lit(1)).as("n_frames"),
            sum(round(col("mean_luma") * 60).cast("long")).as("sum_luma60"),
            max("width").as("width"), max("height").as("height"))
          .orderBy("stream_id")
      },
      // LIVE oracle (round 7; was a frozen VALUES golden): DuckDB replays
      // the synthetic payload's 64-bit LCG exactly in HUGEINT arithmetic
      // (s' = (s·A + C) mod 2^64; the ≤2^127 products fit) via a
      // recursive CTE, then re-derives the per-frame byte sums the stub
      // decoder aggregates — the whole synthesize→sample→decode→agg
      // pipeline independently recomputed from the events table.
      Some("""WITH RECURSIVE
             |ns AS (SELECT greatest(count(*) // 2500, 1) AS n FROM events),
             |seeds AS (
             |  SELECT (user_id % (SELECT n FROM ns)) AS stream_id,
             |         (event_id % 600) AS frame, min(event_id) AS seed
             |  FROM events GROUP BY 1, 2),
             |lcg AS (
             |  SELECT stream_id, frame, 4 AS i,
             |    ((((seed::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
             |      * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s
             |  FROM seeds WHERE frame % 5 = 0
             |  UNION ALL
             |  SELECT stream_id, frame, i + 1,
             |    ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
             |  FROM lcg WHERE i < 63),
             |lumas AS (
             |  SELECT stream_id, frame, CAST(sum(s // 72057594037927936) AS BIGINT) AS luma60
             |  FROM lcg GROUP BY 1, 2)
             |SELECT stream_id, count(*) AS n_frames, sum(luma60)::BIGINT AS sum_luma60,
             |       1280 AS width, 720 AS height
             |FROM lumas GROUP BY 1 ORDER BY 1""".stripMargin)),

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
      // LIVE oracle (round 7; was a frozen VALUES golden): every value in
      // the stub feature vector is a dyadic rational computed by integer
      // ops (payload LCG -> signed-byte 31x fold -> 16 LCG draws ->
      // 24-bit mantissa / 2^24 - 0.5), so float arithmetic is exact and
      // DuckDB replays the whole synthesize->fold->extract->quantize
      // pipeline in HUGEINT mod-2^64 arithmetic via two recursive CTEs.
      Some("""WITH RECURSIVE
             |ns AS (SELECT greatest(count(*) // 2500, 1) AS n FROM events),
             |seeds AS (
             |  SELECT (user_id % (SELECT n FROM ns)) AS stream_id,
             |         (event_id % 600) AS frame, min(event_id) AS seed
             |  FROM events GROUP BY 1, 2),
             |fold AS (
             |  SELECT stream_id, frame, 3 AS j,
             |    ((seed::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
             |    (((((1125899906842597::HUGEINT * 31 + 71) * 31 + 70) * 31 + 84) * 31 + 48) % 18446744073709551616) AS acc
             |  FROM seeds WHERE frame % 10 = 0
             |  UNION ALL
             |  SELECT stream_id, frame, j + 1,
             |    ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616),
             |    (((acc * 31 + (CASE WHEN ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) // 72057594037927936 > 127
             |                        THEN ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) // 72057594037927936 - 256
             |                        ELSE ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) // 72057594037927936 END))
             |      % 18446744073709551616 + 18446744073709551616) % 18446744073709551616)
             |  FROM fold WHERE j < 63),
             |feat AS (
             |  SELECT stream_id, frame, 0 AS i,
             |    ((acc * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s,
             |    CAST(abs(floor(((((acc * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) // 1099511627776) / 16777216.0 - 0.5) * 1000)) AS BIGINT) AS l1
             |  FROM fold WHERE j = 63
             |  UNION ALL
             |  SELECT stream_id, frame, i + 1,
             |    ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616),
             |    l1 + CAST(abs(floor(((((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) // 1099511627776) / 16777216.0 - 0.5) * 1000)) AS BIGINT)
             |  FROM feat WHERE i < 15)
             |SELECT stream_id, count(*) AS n_frames, sum(l1)::BIGINT AS total_l1_q
             |FROM feat WHERE i = 15 GROUP BY 1 ORDER BY 1""".stripMargin)),

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
      // LIVE oracle (round 7; was a frozen VALUES golden): DuckDB replays
      // the audio LCG (A=2862933555777941757) in HUGEINT mod-2^64
      // arithmetic, accumulating the exact integer sum-of-squares and the
      // sign-alternation count per chunk; energy/zcr floats are then
      // reproduced bit-for-bit (sum of squares is integer-exact in
      // double, sqrt is correctly rounded in both engines, CAST AS REAL
      // == .toFloat, and REAL/REAL division == float division — all
      // parity-checked exhaustively for zc in 0..251).
      Some("""WITH RECURSIVE
             |ns AS (SELECT greatest(count(*) // 2500, 1) AS n FROM events),
             |seeds AS (
             |  SELECT (user_id % (SELECT n FROM ns)) AS stream_id,
             |         (event_id % 600) AS chunk, min(event_id) AS seed
             |  FROM events GROUP BY 1, 2),
             |pcm AS (
             |  SELECT stream_id, chunk, 4 AS i,
             |    ((((seed::HUGEINT * 2862933555777941757 + 3037000493) % 18446744073709551616)
             |       * 2862933555777941757 + 3037000493) % 18446744073709551616) AS s,
             |    CAST(((((((seed::HUGEINT * 2862933555777941757 + 3037000493) % 18446744073709551616)
             |       * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936) - 128)
             |      * (((((((seed::HUGEINT * 2862933555777941757 + 3037000493) % 18446744073709551616)
             |       * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936)) - 128) AS BIGINT) AS sumsq,
             |    0 AS zc,
             |    CAST((((((seed::HUGEINT * 2862933555777941757 + 3037000493) % 18446744073709551616)
             |       * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936) AS BIGINT) AS prev
             |  FROM seeds
             |  UNION ALL
             |  SELECT stream_id, chunk, i + 1,
             |    ((s * 2862933555777941757 + 3037000493) % 18446744073709551616),
             |    sumsq + CAST((((s * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936 - 128)
             |      * (((s * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936 - 128) AS BIGINT),
             |    zc + (CASE WHEN (prev < 128 AND ((s * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936 > 128)
             |                 OR (prev > 128 AND ((s * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936 < 128) THEN 1 ELSE 0 END),
             |    CAST(((s * 2862933555777941757 + 3037000493) % 18446744073709551616) // 72057594037927936 AS BIGINT)
             |  FROM pcm WHERE i < 255),
             |chunks AS (
             |  SELECT stream_id, chunk,
             |    CAST(floor(CAST(CAST(sqrt(sumsq / 252.0) AS REAL) AS DOUBLE) * 100) AS BIGINT) AS energy_q,
             |    CAST(floor(CAST(CAST(zc AS REAL) / CAST(252 AS REAL) AS DOUBLE) * 100000) AS BIGINT) AS zcr_q
             |  FROM pcm WHERE i = 255)
             |SELECT stream_id, count(*) AS n_chunks,
             |  sum(energy_q)::BIGINT AS sum_energy_q, sum(zcr_q)::BIGINT AS sum_zcr_q
             |FROM chunks GROUP BY 1 ORDER BY 1""".stripMargin)),

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
          // order-free integer sum (×60+round recovers the byte sum
          // exactly); the keyframe RULE stays on the double mean_luma —
          // the lag/abs/> comparison chain is IEEE-identical cross-engine
          .agg(count(lit(1)).as("n_keyframes"),
            min("frame").as("first_key"), max("frame").as("last_key"),
            sum(round(col("mean_luma") * 60).cast("long")).as("sum_luma60"))
          .join(keyed.groupBy("stream_id").agg(count(lit(1)).as("n_frames")), "stream_id")
          .select("stream_id", "n_frames", "n_keyframes", "first_key", "last_key", "sum_luma60")
          .orderBy("stream_id")
      },
      // LIVE oracle (round 7; was a frozen VALUES golden): the m01
      // recursive-LCG replay, unsampled, with the shot-boundary lag rule
      // re-applied on mean_luma = luma60/60.0 — double division, lag,
      // abs and the >12.0 predicate are all IEEE-identical in DuckDB.
      Some("""WITH RECURSIVE
             |ns AS (SELECT greatest(count(*) // 2500, 1) AS n FROM events),
             |seeds AS (
             |  SELECT (user_id % (SELECT n FROM ns)) AS stream_id,
             |         (event_id % 600) AS frame, min(event_id) AS seed
             |  FROM events GROUP BY 1, 2),
             |lcg AS (
             |  SELECT stream_id, frame, 4 AS i,
             |    ((((seed::HUGEINT * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
             |      * 6364136223846793005 + 1442695040888963407) % 18446744073709551616) AS s
             |  FROM seeds
             |  UNION ALL
             |  SELECT stream_id, frame, i + 1,
             |    ((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616)
             |  FROM lcg WHERE i < 63),
             |lumas AS (
             |  SELECT stream_id, frame, CAST(sum(s // 72057594037927936) AS BIGINT) AS luma60
             |  FROM lcg GROUP BY 1, 2),
             |keyed AS (
             |  SELECT stream_id, frame, luma60, luma60 / 60.0 AS mean_luma,
             |    lag(luma60 / 60.0) OVER (PARTITION BY stream_id ORDER BY frame) AS prev
             |  FROM lumas),
             |flags AS (
             |  SELECT *, (prev IS NULL OR abs(mean_luma - prev) > 12.0) AS is_key
             |  FROM keyed)
             |SELECT f.stream_id, t.n_frames, f.n_keyframes, f.first_key, f.last_key, f.sum_luma60
             |FROM (SELECT stream_id, count(*) AS n_keyframes, min(frame) AS first_key,
             |        max(frame) AS last_key, sum(luma60)::BIGINT AS sum_luma60
             |      FROM flags WHERE is_key GROUP BY 1) f
             |JOIN (SELECT stream_id, count(*) AS n_frames FROM flags GROUP BY 1) t
             |  USING (stream_id)
             |ORDER BY stream_id""".stripMargin)),

    // The COMPOSITE V-ETL pipeline (SURVEY Q1/Q3) as one BATCH gate:
    // synthesize → detect (stub seam) → SORT tracking → 2 s event-time
    // quality windows, integer-exact aggregates. LIVE oracle since
    // round 10: DuckDB recomputes the WHOLE composition — LCG payload
    // synthesis, the luma-modulated detect stub, the full tracker fold
    // as a recursive CTE, and the windowed quality aggregates — from the
    // events table (SortReplayOracle.m05Sql). The same oracle gates
    // n23_vetl_stream, whose Structured-Streaming twin runs the
    // identical composition through trackStream's FMGWS state, so
    // batch == streaming == independent recomputation, end to end.
    // Sentinel frames (far-future, past the cutoff on both twins) exist
    // so the streaming twin's append-mode windows all close; the replay
    // crosses the ~30k-frame sentinel gap via its empty-state frame
    // jump.
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
      Some(SortReplayOracle.m05Sql))
  )
}
