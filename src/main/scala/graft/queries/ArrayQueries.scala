package graft.queries

import graft.{Q, Tables}
import graft.operators.Gcn
import graft.queries.RelationalQueries.bboxSql
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Array/tensor operator catalog (SURVEY.md §2.5 window slices, §2.7
  * numeric kernels): history windows, per-frame grouping, L1 loss,
  * mean-pooling, array slicing, containment joins, homogeneous projection.
  *
  * Float columns are integer-quantized (floor(x*1000)) before summing so
  * group aggregates are order-independent and engine-exact — at scale this
  * also makes the partial aggregates cheap fixed-width longs.
  */
object ArrayQueries {

  val all: Seq[Q] = Seq(

    // W2: trailing history window (TransMOT input: previous T frames).
    Q("a01_history_window",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-3, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_hist"),
            round(sum("value").over(w), 2).as("hist_sum"))
          .filter(col("n_hist") === 3)
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, n_hist, hist_sum FROM (
             | SELECT user_id, event_id,
             |  count(*) OVER (PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS n_hist,
             |  round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 2) AS hist_sum
             | FROM events) t
             |WHERE n_hist = 3 ORDER BY user_id, event_id""".stripMargin)),

    // A2: per-frame grouping into detection lists (scalars extracted from
    // the sorted array so the compare is deterministic). Frame count
    // scales with volume (count/20 → ~20 dets/frame at every SF) so the
    // collect_list group — the per-key memory — stays bounded as data
    // grows.
    Q("a02_frame_group",
      (s, d) => Tables.events(s, d)
        .groupBy((col("event_id") % math.max(Tables.eventCount(s, d) / 20L, 1L)).as("frame"))
        .agg(collect_list(col("event_id")).as("dets"))
        .select(col("frame"), size(col("dets")).cast("long").as("n_dets"),
          array_min(col("dets")).as("first_det"), array_max(col("dets")).as("last_det"))
        .orderBy("frame"),
      Some("""SELECT event_id % (SELECT greatest(count(*) // 20, 1) FROM events) AS frame,
             | count(*) AS n_dets,
             | min(event_id) AS first_det, max(event_id) AS last_det
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M9: L1 prediction loss — zip_with + aggregate over array columns
    // (reference: nn.L1Loss(sum), social_workload.py:174-197). Quantized
    // so the grouped sum is exact.
    Q("a03_l1_loss",
      (s, d) => {
        val center = array((1 to 8).map(i => lit(i * 100L)): _*)
        val pred = transform(slice(col("embedding"), 1, 8),
          x => floor(x.cast("double") * 1000).cast("long"))
        Tables.embeddings(s, d)
          .select(col("label"),
            aggregate(zip_with(pred, center, (p, c) => abs(p - c)), lit(0L), (a, x) => a + x).as("l1"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("l1").cast("long").as("total_l1"))
          .orderBy("label")
      },
      Some("""SELECT label, count(*) AS n, CAST(sum(l1) AS BIGINT) AS total_l1 FROM (
             | SELECT label,
             |  list_sum(list_transform(generate_series(1, 8),
             |    i -> abs(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) - i * 100))) AS l1
             | FROM embeddings) t
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A7: mean-pool feature reduce per label (quantized elementwise sums).
    Q("a04_mean_pool",
      (s, d) => {
        val q = (i: Int) => floor(element_at(col("embedding"), i).cast("double") * 1000).cast("long")
        Tables.embeddings(s, d)
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(sum(q(1)).cast("double") / count(lit(1)) / 1000.0, 4).as("mean_e1"),
            round(sum(q(32)).cast("double") / count(lit(1)) / 1000.0, 4).as("mean_e32"),
            round(sum(q(64)).cast("double") / count(lit(1)) / 1000.0, 4).as("mean_e64"))
          .orderBy("label")
      },
      Some("""SELECT label, count(*) AS n,
             | round(CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE)*1000) AS BIGINT)) AS DOUBLE)/count(*)/1000.0, 4) AS mean_e1,
             | round(CAST(sum(CAST(floor(CAST(embedding[32] AS DOUBLE)*1000) AS BIGINT)) AS DOUBLE)/count(*)/1000.0, 4) AS mean_e32,
             | round(CAST(sum(CAST(floor(CAST(embedding[64] AS DOUBLE)*1000) AS BIGINT)) AS DOUBLE)/count(*)/1000.0, 4) AS mean_e64
             |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin)),

    // W5: frame sampling within segment — slice the first n of each array.
    Q("a05_slice_sample",
      (s, d) => Tables.embeddings(s, d)
        .select(col("label"),
          aggregate(
            transform(slice(col("embedding"), 1, 16),
              x => floor(x.cast("double") * 1000).cast("long")),
            lit(0L), (a, x) => a + x).as("head_sum"))
        .groupBy("label")
        .agg(sum("head_sum").cast("long").as("total_head_sum"))
        .orderBy("label"),
      Some("""SELECT label, CAST(sum(head_sum) AS BIGINT) AS total_head_sum FROM (
             | SELECT label,
             |  list_sum(list_transform(embedding[1:16],
             |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS head_sum
             | FROM embeddings) t
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // J6: substring-containment theta join (MOSEI segment-key stitching).
    Q("a06_containment_join",
      (s, d) => {
        val prefixes = s.createDataFrame(Seq(
          Tuple1("src1"), Tuple1("src2"), Tuple1("src0"))).toDF("prefix")
        Tables.documents(s, d)
          .join(broadcast(prefixes), col("source").contains(col("prefix")))
          .groupBy("prefix")
          .agg(count(lit(1)).as("n_docs"), countDistinct(col("source")).as("n_sources"))
          .orderBy("prefix")
      },
      Some("""WITH prefixes(prefix) AS (VALUES ('src1'), ('src2'), ('src0'))
             |SELECT prefix, count(*) AS n_docs, count(DISTINCT source) AS n_sources
             |FROM documents JOIN prefixes ON contains(source, prefix)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P9: homogeneous-coordinate projection (pixel -> world via a literal
    // 3x3 DLT matrix; covid_measures.py:238-244) + per-frame mean.
    Q("a07_projection",
      (s, d) => {
        // P = [[0.5, 0.1, 20], [-0.05, 0.8, 10], [0.0001, 0.0002, 1]]
        val id = col("event_id")
        val cx = (id * 37 % 1280).cast("double")
        val cy = (id * 53 % 720).cast("double")
        val wdiv = cx * 0.0001 + cy * 0.0002 + 1.0
        // quantize per-row BEFORE summing: integer partial sums are
        // order-independent, so the grouped result is engine-exact (a
        // double sum of 4dp values flips the final rounding when the
        // total lands on a .005 boundary — seen at sf0.001)
        // frame count scales with volume (count/20, as in a02)
        val nFrames = math.max(Tables.eventCount(s, d) / 20L, 1L)
        Tables.events(s, d)
          .select((id % nFrames).as("frame"),
            round(round((cx * 0.5 + cy * 0.1 + 20.0) / wdiv, 4) * 10000).cast("long").as("wxq"),
            round(round((cx * -0.05 + cy * 0.8 + 10.0) / wdiv, 4) * 10000).cast("long").as("wyq"))
          .groupBy("frame")
          .agg(count(lit(1)).as("n"),
            (sum("wxq") / 10000.0).as("sum_wx"), (sum("wyq") / 10000.0).as("sum_wy"))
          .orderBy("frame")
      },
      Some("""SELECT frame, count(*) AS n, sum(wxq)/10000.0 AS sum_wx, sum(wyq)/10000.0 AS sum_wy
             |FROM (SELECT event_id % (SELECT greatest(count(*) // 20, 1) FROM events) AS frame,
             |  CAST(round(round((CAST(event_id*37 % 1280 AS DOUBLE)*0.5 + CAST(event_id*53 % 720 AS DOUBLE)*0.1 + 20.0)
             |    / (CAST(event_id*37 % 1280 AS DOUBLE)*0.0001 + CAST(event_id*53 % 720 AS DOUBLE)*0.0002 + 1.0), 4) * 10000, 0) AS BIGINT) AS wxq,
             |  CAST(round(round((CAST(event_id*37 % 1280 AS DOUBLE)*-0.05 + CAST(event_id*53 % 720 AS DOUBLE)*0.8 + 10.0)
             |    / (CAST(event_id*37 % 1280 AS DOUBLE)*0.0001 + CAST(event_id*53 % 720 AS DOUBLE)*0.0002 + 1.0), 4) * 10000, 0) AS BIGINT) AS wyq
             | FROM events) t
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // M7: one GCN layer (`spmm(adj, X·W)`, pygcn.py:47-94) over the
    // per-frame IoU graph (TransMOT's spatial adjacency, transmot.py) —
    // the sparse matmul IS an edge-join + per-destination sum; see
    // operators/Gcn.scala for the scale/determinism design. Output:
    // per-frame sums of the quantized activations.
    Q("a08_gcn_layer",
      (s, d) => {
        graft.plans.GraftExtensions.register(s)
        val gcnW = Array.tabulate(4, 4)((f, c) => (((f * 4 + c) * 7) % 19 - 9) / 10.0)
        val b = RelationalQueries.bboxen(s, d)
        val a = b.alias("a"); val c = b.alias("b")
        // q06's structural CASE WHEN guard (d3e28fd): the former shape
        // (overlap conjuncts in the join condition + a separate pushed
        // iou filter) let Catalyst order the IoU before the cheap
        // overlap tests on every frame-matched pair — measured 46.8 s
        // at sf10 vs q06's 5.6 s on the SAME pair space; guarded, the
        // non-candidate pairs cost 4 comparisons, never the arithmetic
        val guardedIou = round(
          when(col("a.x1") < col("b.x2") && col("b.x1") < col("a.x2") &&
               col("a.y1") < col("b.y2") && col("b.y1") < col("a.y2"),
            expr("iou(a.x1, a.y1, a.x2, a.y2, b.x1, b.y1, b.x2, b.y2)"))
            .otherwise(lit(0.0)), 4)
        val edges = a.join(c,
            col("a.frame") === col("b.frame") && col("a.det_id") < col("b.det_id"))
          .select(col("a.det_id").as("src"), col("b.det_id").as("dst"),
            guardedIou.as("giou"))
          .filter(col("giou") > 0.1)
          .select(col("src"), col("dst"))
        val nodes = b.select(col("det_id").as("node_id"),
          array(col("x1"), col("y1"), col("x2"), col("y2")).as("features"))
        Gcn.layer(nodes, edges, gcnW)
          .join(b.select(col("det_id").as("node_id"), col("frame")), "node_id")
          .groupBy("frame")
          .agg(count(lit(1)).as("n_nodes"),
            sum("h0").as("sum_h0"), sum("h1").as("sum_h1"),
            sum("h2").as("sum_h2"), sum("h3").as("sum_h3"))
          .orderBy("frame")
      },
      Some(s"""WITH b AS ($bboxSql),
              |e AS (
              |  SELECT a.det_id AS i, b.det_id AS j
              |  FROM b a JOIN b b ON a.frame = b.frame AND a.det_id < b.det_id
              |  WHERE round(greatest(0.0, least(a.x2,b.x2)-greatest(a.x1,b.x1))
              |      * greatest(0.0, least(a.y2,b.y2)-greatest(a.y1,b.y1))
              |   / ((a.x2-a.x1)*(a.y2-a.y1) + (b.x2-b.x1)*(b.y2-b.y1)
              |      - greatest(0.0, least(a.x2,b.x2)-greatest(a.x1,b.x1))
              |      * greatest(0.0, least(a.y2,b.y2)-greatest(a.y1,b.y1))), 4) > 0.1),
              |xw AS (
              |  SELECT det_id, frame,
              |    CAST(floor((x1*-0.9 + y1*0.0 + x2*0.9 + y2*-0.1)*1000000) AS BIGINT) AS q0,
              |    CAST(floor((x1*-0.2 + y1*0.7 + x2*-0.3 + y2*0.6)*1000000) AS BIGINT) AS q1,
              |    CAST(floor((x1*0.5 + y1*-0.5 + x2*0.4 + y2*-0.6)*1000000) AS BIGINT) AS q2,
              |    CAST(floor((x1*-0.7 + y1*0.2 + x2*-0.8 + y2*0.1)*1000000) AS BIGINT) AS q3
              |  FROM b),
              |adj AS (
              |  SELECT i, j FROM e
              |  UNION ALL SELECT j AS i, i AS j FROM e
              |  UNION ALL SELECT det_id AS i, det_id AS j FROM b),
              |agg AS (
              |  SELECT adj.i AS det_id, count(*) AS deg,
              |    sum(x.q0) AS s0, sum(x.q1) AS s1, sum(x.q2) AS s2, sum(x.q3) AS s3
              |  FROM adj JOIN xw x ON x.det_id = adj.j GROUP BY 1),
              |h AS (
              |  SELECT x.frame,
              |    greatest(s0, 0) // deg AS h0, greatest(s1, 0) // deg AS h1,
              |    greatest(s2, 0) // deg AS h2, greatest(s3, 0) // deg AS h3
              |  FROM agg JOIN xw x USING (det_id))
              |SELECT frame, count(*) AS n_nodes,
              |  CAST(sum(h0) AS BIGINT) AS sum_h0, CAST(sum(h1) AS BIGINT) AS sum_h1,
              |  CAST(sum(h2) AS BIGINT) AS sum_h2, CAST(sum(h3) AS BIGINT) AS sum_h3
              |FROM h GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
