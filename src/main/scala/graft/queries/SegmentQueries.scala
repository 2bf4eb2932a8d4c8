package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MOSEI-style multimodal segment pipeline (SURVEY §1.1 multimodal
  * segments; W3 fixed 30-frame segmentation, W4 segment-skip knob, M8
  * late-fusion inference stub, M9 L1 loss) as one composite query.
  *
  * The per-frame modality features become ordered per-segment tensors
  * (sort_array(collect_list(struct(...))) — the ARRAY<ARRAY<FLOAT>> shape
  * of FIXTURES A7); the oracle checks the pipeline's scalar outputs, which
  * fold the same tensors through plain aggregation.
  */
object SegmentQueries {

  val all: Seq[Q] = Seq(

    Q("s01_mosei_segments",
      (s, d) => {
        // stream count scales with volume (count/2500, as in ControlQueries)
        val nStreams = math.max(Tables.eventCount(s, d) / 2500L, 1L)
        val w = Window.partitionBy("stream_id").orderBy("event_id")
        val base = Tables.events(s, d)
          .select((col("user_id") % nStreams).as("stream_id"), col("event_id"),
            (col("value") / 500.0).as("t1"),
            ((col("event_id") % 7) / 7.0).as("v1"),
            ((col("event_id") % 13) / 13.0).as("a1"))
          .withColumn("rn", row_number().over(w).cast("long") - 1)
          .withColumn("seg", floor(col("rn") / 30))

        // W3: per-segment ordered modality tensors
        val segs = base.groupBy("stream_id", "seg")
          .agg(
            sort_array(collect_list(struct(col("rn"), col("t1")))).as("text"),
            sort_array(collect_list(struct(col("rn"), col("v1")))).as("visual"),
            sort_array(collect_list(struct(col("rn"), col("a1")))).as("acoustic"),
            count(lit(1)).as("n"))
          .filter(col("n") === 30 && col("seg") % 2 === 0) // complete + skip knob (W4)

        // M8 stub: late fusion = per-modality mean folded to a 3-dim score
        def fold(c: String, field: String) =
          aggregate(col(c), lit(0.0), (acc, x) => acc + x.getField(field)) / 30.0
        val scored = segs
          .withColumn("p_text", fold("text", "t1"))
          .withColumn("p_visual", fold("visual", "v1"))
          .withColumn("p_acoustic", fold("acoustic", "a1"))
          // M9: L1 loss against a derived label vector
          .withColumn("l1",
            abs(col("p_text") - 0.5) + abs(col("p_visual") - 0.4) + abs(col("p_acoustic") - 0.5))

        scored.select(col("stream_id"), col("seg"), col("n"),
            round(col("p_text"), 4).as("p_text"),
            round(col("p_visual"), 4).as("p_visual"),
            round(col("p_acoustic"), 4).as("p_acoustic"),
            round(col("l1"), 4).as("l1"))
          .orderBy("stream_id", "seg")
      },
      Some("""SELECT stream_id, seg, n,
             | round(p_text, 4) AS p_text, round(p_visual, 4) AS p_visual,
             | round(p_acoustic, 4) AS p_acoustic,
             | round(abs(p_text - 0.5) + abs(p_visual - 0.4) + abs(p_acoustic - 0.5), 4) AS l1
             |FROM (
             | SELECT stream_id, seg, count(*) AS n,
             |  sum(t1)/30.0 AS p_text, sum(v1)/30.0 AS p_visual, sum(a1)/30.0 AS p_acoustic
             | FROM (
             |  SELECT user_id % ns AS stream_id,
             |   CAST(floor((row_number() OVER (PARTITION BY user_id % ns ORDER BY event_id) - 1) / 30) AS BIGINT) AS seg,
             |   value/500.0 AS t1, (event_id % 7)/7.0 AS v1, (event_id % 13)/13.0 AS a1
             |  FROM events, (SELECT greatest(count(*) // 2500, 1) AS ns FROM events) nrm) f
             | GROUP BY 1, 2) g
             |WHERE n = 30 AND seg % 2 = 0
             |ORDER BY stream_id, seg""".stripMargin))
  )
}
