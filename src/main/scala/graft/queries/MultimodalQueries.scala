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
        val frames = Multimodal.syntheticFrames(Tables.events(s, d))
        val sampled = Multimodal.sampleFrames(frames, every = 5)
        Multimodal.decodeStub(sampled)
          .groupBy("stream_id")
          .agg(count(lit(1)).as("n_frames"),
            round(sum("mean_luma"), 2).as("sum_luma"),
            max("width").as("width"), max("height").as("height"))
          .orderBy("stream_id")
      },
      None),

    // feature extraction over resized frames -> per-stream quantized
    // feature-norm aggregate (M4's 4096-dim features, stub dim=16).
    Q("m02_frame_features",
      (s, d) => {
        val frames = Multimodal.resizeStub(
          Multimodal.sampleFrames(Multimodal.syntheticFrames(Tables.events(s, d)), every = 10),
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
      None)
  )
}
