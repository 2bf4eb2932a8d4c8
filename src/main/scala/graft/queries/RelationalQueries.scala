package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator catalog — SURVEY.md §2.2–2.6 re-expressed over the
  * driver testdata, each with a DuckDB oracle.
  *
  * Scale notes (100 TB design): every query here is declarative DataFrame
  * code — Catalyst pushes filters/projections into the parquet scan, AQE
  * picks broadcast vs shuffled joins and coalesces post-shuffle partitions.
  * Dimension tables (region/nation/inline knob dims) are explicitly
  * broadcast. Aggregations are partial (map-side combine) by construction.
  * Window functions partition on high-cardinality keys (user_id, frame) so
  * state per partition stays bounded as data grows.
  */
object RelationalQueries {

  // ---- shared synthetic-bbox adapter (FIXTURES.md §B) -------------------
  // Deterministic bboxes derived from events.event_id; some fall outside
  // the 1280x720 frame so the clipping operator (P4) has work to do.
  // Mirrors: reference detections [x1,y1,x2,y2,score] (sort.py:213).
  // The frame count scales with data volume (count/40 frames → ~40 boxes
  // per frame at EVERY SF) so per-frame density — and the per-frame
  // quadratic pair space in q06 — stays constant as the input grows; a
  // fixed modulus would concentrate 100 TB into 250 frames.
  private[queries] def bboxen(s: SparkSession, d: String): DataFrame = {
    val nFrames = math.max(Tables.eventCount(s, d) / 40L, 1L)
    val e = Tables.events(s, d)
    val id = col("event_id")
    e.select(
      id.as("det_id"),
      (id % nFrames).as("frame"),
      ((id * 37) % 1340 - 60).cast("double").as("x1"),
      ((id * 53) % 800 - 40).cast("double").as("y1"),
      ((id * 37) % 1340 - 60 + (id % 200) + 10).cast("double").as("x2"),
      ((id * 53) % 800 - 40 + (id % 150) + 10).cast("double").as("y2"),
      (col("value") / 500.0).as("score")
    )
  }
  private[queries] val bboxSql =
    """SELECT event_id AS det_id,
      |  event_id % (SELECT greatest(count(*) // 40, 1) FROM events) AS frame,
      |  CAST((event_id*37) % 1340 - 60 AS DOUBLE) AS x1,
      |  CAST((event_id*53) % 800 - 40 AS DOUBLE) AS y1,
      |  CAST((event_id*37) % 1340 - 60 + (event_id % 200) + 10 AS DOUBLE) AS x2,
      |  CAST((event_id*53) % 800 - 40 + (event_id % 150) + 10 AS DOUBLE) AS y2,
      |  value/500.0 AS score
      |FROM events""".stripMargin

  /** IoU of two boxes as a pure codegen-friendly column expression
    * (reference: iou_batch, sort.py:47-63; bb_intersection_over_union,
    * object_detection.py:105-130). Built from builtin expressions so it
    * stays inside whole-stage codegen — no UDF boundary.
    */
  def iou(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
          bx1: Column, by1: Column, bx2: Column, by2: Column): Column = {
    val iw = greatest(lit(0.0), least(ax2, bx2) - greatest(ax1, bx1))
    val ih = greatest(lit(0.0), least(ay2, by2) - greatest(ay1, by1))
    val inter = iw * ih
    val union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    inter / union
  }

  /** q49/n28 shared CDC pieces: the customer snapshot in integer cents,
    * the change-struct projection of orders ((date, orderkey, op, value)
    * — struct max = latest-wins), and the snapshot merge (delete filter
    * + upsert coalesce). Shared so the streaming leg provably applies
    * the identical semantics to the identical oracle.
    */
  private[queries] def cdcSnapshot(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey").as("key"),
        floor(col("c_acctbal") * 100).cast("long").as("snap_cents"))

  private[queries] def cdcChangeStruct(orders: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("key"),
      struct(col("o_orderdate"), col("o_orderkey"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
        floor(col("o_totalprice") * 100).cast("long").as("new_bal")).as("ch"))

  private[queries] def cdcMerge(snap: DataFrame, last: DataFrame): DataFrame =
    snap.join(last, Seq("key"), "left")
      .filter(col("last").isNull || col("last.op") =!= "D")
      .select(col("key"),
        when(col("last.op") === "U", lit("updated"))
          .otherwise(lit("snapshot")).as("src"),
        when(col("last.op") === "U", col("last.new_bal"))
          .otherwise(col("snap_cents")).as("bal_cents"))
      .orderBy("key")

  private[queries] val cdcOracleSql: String =
    """WITH log AS (
      |  SELECT o_custkey AS key, o_orderdate, o_orderkey,
      |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
      |    CAST(floor(o_totalprice * 100) AS BIGINT) AS new_bal
      |  FROM orders),
      |last AS (
      |  SELECT key, op, new_bal FROM (
      |    SELECT *, row_number() OVER (PARTITION BY key
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM log)
      |  WHERE rn = 1)
      |SELECT c.c_custkey AS key,
      |  CASE WHEN l.op = 'U' THEN 'updated' ELSE 'snapshot' END AS src,
      |  CASE WHEN l.op = 'U' THEN l.new_bal
      |       ELSE CAST(floor(c.c_acctbal * 100) AS BIGINT) END AS bal_cents
      |FROM customer c LEFT JOIN last l ON l.key = c.c_custkey
      |WHERE l.op IS NULL OR l.op <> 'D'
      |ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(

    // A1: grouped quality/cost sums (simulate.py totals) — TPC-H-Q1 shape.
    Q("q01_pricing_summary",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum("l_quantity"), 4).as("sum_qty"),
            round(sum("l_extendedprice"), 4).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             | round(sum(l_quantity),4) AS sum_qty,
             | round(sum(l_extendedprice),4) AS sum_base_price,
             | round(sum(l_extendedprice*(1.0-l_discount)),4) AS sum_disc_price,
             | round(avg(l_quantity),4) AS avg_qty,
             | count(*) AS count_order
             |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // P1+P5: class filter + projection (covid_workload.py:74).
    Q("q02_filter_project",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id"),
      Some("SELECT event_id, user_id, value FROM events WHERE event_type = 'click' ORDER BY event_id")),

    // P2: frame-cadence filter (covid_measures.py:271-277).
    Q("q03_cadence_filter",
      (s, d) => Tables.events(s, d)
        .filter(col("event_id") % 7 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id"),
      Some("SELECT event_id, event_type, value FROM events WHERE event_id % 7 = 0 ORDER BY event_id")),

    // P4: bbox clipping to the 1280x720 frame (object_detection.py:21-36).
    Q("q04_bbox_clip",
      (s, d) => bboxen(s, d)
        .select(
          col("det_id"),
          greatest(lit(0.0), col("x1")).as("cx1"),
          greatest(lit(0.0), col("y1")).as("cy1"),
          least(lit(1280.0), col("x2")).as("cx2"),
          least(lit(720.0), col("y2")).as("cy2"))
        .orderBy("det_id"),
      Some(s"""WITH b AS ($bboxSql)
              |SELECT det_id, greatest(0.0, x1) AS cx1, greatest(0.0, y1) AS cy1,
              |       least(1280.0, x2) AS cx2, least(720.0, y2) AS cy2
              |FROM b ORDER BY det_id""".stripMargin)),

    // P6/P7: bbox <-> center/area/aspect conversion (sort.py:66-91).
    Q("q05_bbox_convert",
      (s, d) => bboxen(s, d)
        .select(
          col("det_id"),
          round((col("x1") + col("x2")) / 2.0, 4).as("cx"),
          round((col("y1") + col("y2")) / 2.0, 4).as("cy"),
          round((col("x2") - col("x1")) * (col("y2") - col("y1")), 4).as("area"),
          round((col("x2") - col("x1")) / (col("y2") - col("y1")), 4).as("aspect"))
        .orderBy("det_id"),
      Some(s"""WITH b AS ($bboxSql)
              |SELECT det_id, round((x1+x2)/2.0,4) AS cx, round((y1+y2)/2.0,4) AS cy,
              |       round((x2-x1)*(y2-y1),4) AS area,
              |       round((x2-x1)/(y2-y1),4) AS aspect
              |FROM b ORDER BY det_id""".stripMargin)),

    // J1/J2: per-frame pairwise IoU theta-join (sort.py:47-63;
    // object_detection.py:51-63). Equi on frame + theta on overlap; at
    // scale the frame key shuffles both sides to the same partition so the
    // quadratic blow-up is bounded per frame, not global.
    // Measured: a grid-cell pre-bucketing variant (explode to 256px
    // x-cells, leftmost-cell ownership) returns identical rows at
    // identical steady-state cost (3.1s vs 3.2s at sf0.1, warm JVM) —
    // per-frame density is fixed (~40) by construction, so cell
    // bucketing only re-partitions the same candidate volume; the
    // simpler frame-keyed plan is kept.
    // The overlap precondition is fused INSIDE a CASE WHEN guarding the
    // IoU: Catalyst pushes the `iou > 0.1` filter into the join
    // condition and is free to order it BEFORE the cheap conjuncts
    // (observed at sf1: the full IoU ran on all ~40M frame-matched
    // pairs). A structural guard can't be reordered away — non-candidate
    // pairs cost 4 comparisons, never the IoU arithmetic.
    Q("q06_iou_join",
      (s, d) => {
        // native codegen'd IoU expression (graft.plans.Iou)
        graft.plans.GraftExtensions.register(s)
        val b = bboxen(s, d)
        val a = b.alias("a"); val c = b.alias("b")
        val guardedIou = round(
          when(col("a.x1") < col("b.x2") && col("b.x1") < col("a.x2") &&
               col("a.y1") < col("b.y2") && col("b.y1") < col("a.y2"),
            expr("iou(a.x1, a.y1, a.x2, a.y2, b.x1, b.y1, b.x2, b.y2)"))
            .otherwise(lit(0.0)), 4)
        a.join(c, col("a.frame") === col("b.frame") && col("a.det_id") < col("b.det_id"))
          .select(
            col("a.frame").as("frame"),
            col("a.det_id").as("det_a"),
            col("b.det_id").as("det_b"),
            guardedIou.as("iou"))
          .filter(col("iou") > 0.1)
          .orderBy("frame", "det_a", "det_b")
      },
      Some(s"""WITH b AS ($bboxSql)
              |SELECT a.frame AS frame, a.det_id AS det_a, b.det_id AS det_b,
              |  round(greatest(0.0, least(a.x2,b.x2)-greatest(a.x1,b.x1))
              |      * greatest(0.0, least(a.y2,b.y2)-greatest(a.y1,b.y1))
              |   / ((a.x2-a.x1)*(a.y2-a.y1) + (b.x2-b.x1)*(b.y2-b.y1)
              |      - greatest(0.0, least(a.x2,b.x2)-greatest(a.x1,b.x1))
              |      * greatest(0.0, least(a.y2,b.y2)-greatest(a.y1,b.y1))), 4) AS iou
              |FROM b a JOIN b b ON a.frame = b.frame AND a.det_id < b.det_id
              |WHERE round(greatest(0.0, least(a.x2,b.x2)-greatest(a.x1,b.x1))
              |      * greatest(0.0, least(a.y2,b.y2)-greatest(a.y1,b.y1))
              |   / ((a.x2-a.x1)*(a.y2-a.y1) + (b.x2-b.x1)*(b.y2-b.y1)
              |      - greatest(0.0, least(a.x2,b.x2)-greatest(a.x1,b.x1))
              |      * greatest(0.0, least(a.y2,b.y2)-greatest(a.y1,b.y1))), 4) > 0.1
              |ORDER BY frame, det_a, det_b""".stripMargin)),

    // J7: fact-dim join chain; nation/region explicitly broadcast (they are
    // dim-sized at any SF — profiles/categories in the reference).
    Q("q07_join_agg",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
               round(sum("o_totalprice"), 2).as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_orders,
             | round(sum(o_totalprice),2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // J5: prev-row identity join via lag (data_prepare.py:100-117) —
    // shifted-key self-join expressed as a window, no second scan.
    Q("q08_prev_event",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("value"),
                  lag("event_id", 1).over(w).as("prev_event_id"),
                  round(col("value") - lag("value", 1).over(w), 2).as("delta"))
          .filter(col("prev_event_id").isNotNull)
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT * FROM (
             | SELECT user_id, event_id, value,
             |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event_id,
             |  round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 2) AS delta
             | FROM events) t
             |WHERE prev_event_id IS NOT NULL ORDER BY user_id, event_id""".stripMargin)),

    // W6/W7: top-k per group (knob_switcher.py:36-57 priority scan).
    Q("q09_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
                  row_number().over(w).cast("long").as("rk"))
          .filter(col("rk") <= 3)
          .orderBy("o_orderpriority", "rk")
      },
      Some("""SELECT * FROM (
             | SELECT o_orderpriority, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_orderpriority
             |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
             | FROM orders) t
             |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin)),

    // D2: Pareto dominance anti-join (knob_tuner.py:214-237): keep parts
    // not dominated on (price low, size high) within their brand. The
    // brand equi-key keeps the quadratic comparison bounded per group —
    // the same trick that makes this survive 100x data.
    Q("q10_pareto",
      (s, d) => {
        val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_retailprice", "p_size")
        val dom = p.alias("o")
        p.alias("c").join(dom,
            col("o.p_brand") === col("c.p_brand") &&
            col("o.p_retailprice") <= col("c.p_retailprice") &&
            col("o.p_size") >= col("c.p_size") &&
            (col("o.p_retailprice") < col("c.p_retailprice") || col("o.p_size") > col("c.p_size")),
            "left_anti")
          .select(col("c.p_brand").as("p_brand"), col("c.p_partkey").as("p_partkey"),
                  col("c.p_retailprice").as("p_retailprice"), col("c.p_size").as("p_size"))
          .orderBy("p_brand", "p_partkey")
      },
      Some("""SELECT c.p_brand AS p_brand, c.p_partkey AS p_partkey,
             |       c.p_retailprice AS p_retailprice, c.p_size AS p_size
             |FROM part c WHERE NOT EXISTS (
             |  SELECT 1 FROM part o WHERE o.p_brand = c.p_brand
             |   AND o.p_retailprice <= c.p_retailprice AND o.p_size >= c.p_size
             |   AND (o.p_retailprice < c.p_retailprice OR o.p_size > c.p_size))
             |ORDER BY p_brand, p_partkey""".stripMargin)),

    // D1: dedup — deterministic representative per key (knob_tuner.py:189-196).
    Q("q11_dedup",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(min("o_orderkey").as("first_order"),
             round(max("o_totalprice"), 2).as("max_price"),
             count(lit(1)).as("n"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, min(o_orderkey) AS first_order,
             | round(max(o_totalprice),2) AS max_price, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A3/A4: category histogram normalized to frequencies
    // (knob_switcher.py:82-83; bincount knob_plan.py:216-219).
    Q("q12_histogram",
      (s, d) => {
        val e = Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt"))
        e.select(col("event_type"), col("cnt"),
                 round(col("cnt") / sum("cnt").over(Window.partitionBy()), 6).as("freq"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, cnt, round(cnt / sum(cnt) OVER (), 6) AS freq
             |FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1) t
             |ORDER BY event_type""".stripMargin)),

    // W1/W4: carry-forward of last non-null (detect-to-track cadence,
    // social_workload.py:147-172): only every 3rd event "runs the
    // detector"; others reuse the last detection.
    Q("q13_carry_forward",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  when(col("event_id") % 3 === 0, col("value")).as("detected"))
          .select(col("user_id"), col("event_id"),
                  last("detected", ignoreNulls = true).over(w).as("carried"))
          .filter(col("carried").isNotNull)
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, carried FROM (
             | SELECT user_id, event_id,
             |  last_value(CASE WHEN event_id % 3 = 0 THEN value END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
             | FROM events) t
             |WHERE carried IS NOT NULL ORDER BY user_id, event_id""".stripMargin)),

    // W3: fixed tumbling windows (2s chunks; social_workload.py:105-123)
    // — expressed over event-time minutes so the oracle is portable.
    Q("q14_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(date_format(Tables.tsFromNanos(col("ts")), "yyyy-MM-dd HH:mm").as("chunk"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("chunk"),
      Some("""SELECT strftime(ts, '%Y-%m-%d %H:%M') AS chunk, count(*) AS n,
             | round(sum(value),2) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P10: date-key arithmetic (knob_plan.py:23-32 hand-rolled carry →
    // native interval arithmetic).
    Q("q15_date_arith",
      (s, d) => Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"), "yyyy-MM").as("month_p90"))
        .agg(count(lit(1)).as("n"))
        .orderBy("month_p90"),
      Some("""SELECT strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m') AS month_p90,
             | count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P12: natural sort key via digit extraction (object_detection.py:132-141).
    Q("q16_natural_sort",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
                regexp_extract(col("props"), "([0-9]+)", 1).cast("int").as("k"))
        .orderBy("k", "event_id")
        .limit(500),
      Some("""SELECT event_id, CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
             |FROM events ORDER BY k, event_id LIMIT 500""".stripMargin)),

    // P11/S5: JSON config extraction + malformed-row filter
    // (knob_plan.py:266-269; main.py:46-51).
    Q("q17_json_extract",
      // from_json with an explicit narrow schema instead of
      // get_json_object: the Jackson parse materializes only $.k —
      // measured 12.6 s -> 1.05 s at sf1 (1M rows), identical result
      (s, d) => Tables.events(s, d)
        .select(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
        .filter(col("k").isNotNull && col("k") >= 50)
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT k % 10 AS bucket, count(*) AS n FROM (
             | SELECT CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS INT) AS k
             | FROM events) t
             |WHERE k IS NOT NULL AND k >= 50 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // unionByName (knob_tuner.py:286-288 candidate-list union).
    Q("q18_union",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"), lit("c").as("side"))
        val sup = Tables.supplier(s, d)
          .select(col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"), lit("s").as("side"))
        c.unionByName(sup)
          .groupBy("nationkey", "side")
          .agg(count(lit(1)).as("n"), round(sum("acctbal"), 2).as("total_bal"))
          .orderBy("nationkey", "side")
      },
      Some("""SELECT nationkey, side, count(*) AS n, round(sum(acctbal),2) AS total_bal
             |FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'c' AS side FROM customer
             |      UNION ALL
             |      SELECT s_nationkey, s_acctbal, 's' FROM supplier) t
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // D4/D5: anti-join (set difference on keys; data_prepare.py:103-116).
    Q("q19_anti_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_inactive"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_inactive FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // semi-join counterpart.
    Q("q20_semi_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_active"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n_active FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // W7: argmax via max_by (knob_switcher.py:88-93 top-1 selections).
    Q("q21_argmax",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
             round(max("o_totalprice"), 2).as("best_price"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, max_by(o_orderkey, o_totalprice) AS best_order,
             | round(max(o_totalprice),2) AS best_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // P13: reward scalar expression (placement_optimizer.py:112-117):
    // reward = -cost - delta*max(0, runtime - realtime).
    Q("q22_reward",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"),
                (-(col("l_extendedprice") * col("l_discount"))
                 - lit(0.5) * greatest(lit(0.0), col("l_quantity") / 10.0 - 2.0)).as("reward"))
        .groupBy("l_returnflag")
        .agg(round(sum("reward"), 2).as("total_reward"), count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             | round(sum(-(l_extendedprice*l_discount) - 0.5*greatest(0.0, l_quantity/10.0 - 2.0)),2) AS total_reward,
             | count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A1 streaming shape: running sums per key (buffer occupancy ledger,
    // buffer.py:32-33) — ordered window so both engines sum identically.
    Q("q23_running_sum",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
                  round(sum("value").over(w), 2).as("running"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             | round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // Cube over both grouping dims (free analytics layer).
    Q("q25_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS qty,
             | count(*) AS n
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Numeric RANGE window frame (value-based history, not row-based).
    Q("q26_range_window",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id").rangeBetween(-100, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_in_range"),
            round(sum("value").over(w), 2).as("range_sum"))
          .filter(col("n_in_range") > 0)
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, n_in_range, range_sum FROM (
             | SELECT user_id, event_id,
             |  count(*) OVER (PARTITION BY user_id ORDER BY event_id
             |    RANGE BETWEEN 100 PRECEDING AND 1 PRECEDING) AS n_in_range,
             |  round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
             |    RANGE BETWEEN 100 PRECEDING AND 1 PRECEDING), 2) AS range_sum
             | FROM events) t
             |WHERE n_in_range > 0 ORDER BY user_id, event_id""".stripMargin)),

    // Skew-safe salted join: half the fact rows collapse onto one key
    // (the viral-stream shape AQE's skew split may miss when the dim side
    // must replicate); Partitioning.saltedJoin spreads the hot key over 8
    // reducers and returns the IDENTICAL result set — the oracle is the
    // plain join.
    Q("q27_salted_skew_join",
      (s, d) => {
        // hot key 1L = an EXISTING c_custkey (keys start at 1), so the
        // replicated hot half actually joins and the salt-spread path is
        // exercised on matching rows, not silently dropped by the inner join
        val fact = Tables.events(s, d).select(
          when(col("event_id") % 2 === 0, 1L).otherwise(col("user_id")).as("uid"),
          col("value"))
        val dim = Tables.customer(s, d)
          .select(col("c_custkey").as("uid"), col("c_nationkey"))
        graft.operators.Partitioning.saltedJoin(fact, dim, "uid", numSalts = 8)
          .groupBy("c_nationkey")
          // quantize BEFORE summing: integer partial sums are
          // order-independent, so the 2dp rounding can't flip on a
          // cross-engine summation-order boundary (the a05 lesson)
          .agg(count(lit(1)).as("n"),
            round(sum(floor(col("value") * 1000).cast("long")) / 1000.0, 2).as("total_value"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n,
             |  round(sum(CAST(floor(value * 1000) AS BIGINT)) / 1000.0, 2) AS total_value
             |FROM (SELECT CASE WHEN event_id % 2 = 0 THEN 1 ELSE user_id END AS uid, value
             |      FROM events) f
             |JOIN customer ON f.uid = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // As-of join (TemporalJoins.asofJoin): every purchase aligned to the
    // same user's latest strictly-earlier click — the union+window form,
    // one shuffle on user_id, no range probe. All temporal math in µs:
    // the parquet carries TIMESTAMP(NANOS) but DuckDB truncates to µs on
    // read, so both engines order and subtract the SAME integers.
    Q("q28_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"),
          expr("ts div 1000").as("ts"), col("user_id"), col("event_type"),
          col("value"))
        val purchases = ev.filter(col("event_type") === "purchase")
        val clicks = ev.filter(col("event_type") === "click")
        graft.operators.TemporalJoins.asofJoin(
            purchases, clicks, keys = Seq("user_id"),
            orderCols = Seq("ts", "event_id"),
            payload = Seq("event_id", "ts", "value"))
          .filter(col("asof_event_id").isNotNull)
          .select(col("event_id"), col("user_id"),
            round(col("value"), 2).as("value"),
            col("asof_event_id").as("prior_click_id"),
            round(col("asof_value"), 2).as("prior_click_value"),
            expr("(ts - asof_ts) div 1000000").as("gap_s"))
          .orderBy("event_id")
      },
      Some("""WITH u AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS ts, value, event_type,
             |         CASE WHEN event_type = 'click'
             |              THEN {'id': event_id, 'ts': epoch_us(ts), 'v': value} END AS c
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |w AS (
             |  SELECT *, last_value(c IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
             |  FROM u)
             |SELECT event_id, user_id, round(value, 2) AS value,
             |  pc.id AS prior_click_id, round(pc.v, 2) AS prior_click_value,
             |  (ts - pc.ts) // 1000000 AS gap_s
             |FROM w WHERE event_type = 'purchase' AND pc IS NOT NULL
             |ORDER BY event_id""".stripMargin)),

    // Interval-overlap join (TemporalJoins.overlapJoin): purchase vs
    // error 30-minute activity windows that intersect, bucketed into
    // 1-hour keys (≤2 buckets per interval) so the join stays an
    // equi-join — a naive range-predicate join plans a nested-loop cross
    // product. Output is aggregated per day (pair-level rows are
    // join-order noise at bench SF).
    Q("q29_interval_overlap",
      (s, d) => {
        val halfHourUs = 1800L * 1000000
        def iv(tpe: String) = Tables.events(s, d)
          .filter(col("event_type") === tpe)
          .select(col("event_id").as("id"), expr("ts div 1000").as("s"),
            (expr("ts div 1000") + halfHourUs).as("e"))
        graft.operators.TemporalJoins
          .overlapJoin(iv("purchase"), iv("error"), bucket = 3600L * 1000000)
          .select(expr("a_s div 86400000000").as("day"),
            expr("abs(a_s - b_s) div 1000000").as("gap_s"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_pairs"), sum("gap_s").as("sum_gap_s"))
          .orderBy("day")
      },
      Some("""WITH a AS (SELECT event_id AS id, epoch_us(ts) AS s,
             |    epoch_us(ts) + 1800000000 AS e FROM events WHERE event_type = 'purchase'),
             |b AS (SELECT event_id AS id, epoch_us(ts) AS s,
             |    epoch_us(ts) + 1800000000 AS e FROM events WHERE event_type = 'error')
             |SELECT a.s // 86400000000 AS day, count(*) AS n_pairs,
             |  CAST(sum(abs(a.s - b.s) // 1000000) AS BIGINT) AS sum_gap_s
             |FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gap-based sessionization (Sessionize.sessionize): per-user
    // sessions split at >30-minute silences, aggregated per session.
    // One sort shuffle on user_id; value sums stay integer (milli-units)
    // so the aggregation is order-independent on both engines.
    Q("q30_sessionize",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          expr("ts div 1000").as("ts"), col("event_id"),
          floor(col("value") * 1000).cast("long").as("v"))
        graft.operators.Sessionize.sessionize(ev, keys = Seq("user_id"),
            orderCols = Seq("ts", "event_id"), gapCol = col("ts"),
            gap = 1800L * 1000000)
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"), min("ts").as("start_us"),
            expr("(max(ts) - min(ts)) div 1000000").as("dur_s"),
            sum("v").as("value_sum_milli"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id,
             |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
             |f AS (SELECT *, CASE WHEN ts - lag(ts) OVER w > 1800000000
             |                     THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM f)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS start_us, (max(ts) - min(ts)) // 1000000 AS dur_s,
             |  CAST(sum(v) AS BIGINT) AS value_sum_milli
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Ordered conversion funnel: view → first later click → first later
    // purchase per user, all µs-exact min-chaining over TWO window passes
    // on ONE user_id shuffle (same partitioning, Catalyst reuses the
    // exchange). No joins, no per-step scans.
    Q("q31_funnel",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        val ev = Tables.events(s, d).select(col("user_id"),
          expr("ts div 1000").as("ts"), col("event_type"))
        val step1 = ev.withColumn("v",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        val step2 = step1.withColumn("c",
          min(when(col("event_type") === "click" && col("ts") > col("v"), col("ts"))).over(w))
        val step3 = step2.withColumn("p",
          min(when(col("event_type") === "purchase" && col("ts") > col("c"), col("ts"))).over(w))
        step3.groupBy("user_id")
          .agg(first("v").as("v"), first("c").as("c"), first("p").as("p"))
          .agg(count(lit(1)).as("n_users"),
            count("v").as("n_view"), count("c").as("n_view_click"),
            count("p").as("n_full_funnel"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
             |u AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts END) AS v FROM e GROUP BY 1),
             |uc AS (SELECT u.user_id, u.v,
             |    min(CASE WHEN e.event_type = 'click' AND e.ts > u.v THEN e.ts END) AS c
             |  FROM u JOIN e USING (user_id) GROUP BY 1, 2),
             |up AS (SELECT uc.user_id, uc.v, uc.c,
             |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > uc.c THEN e.ts END) AS p
             |  FROM uc JOIN e USING (user_id) GROUP BY 1, 2, 3)
             |SELECT count(*) AS n_users, count(v) AS n_view,
             |  count(c) AS n_view_click, count(p) AS n_full_funnel
             |FROM up""".stripMargin)),

    // Pivot: per-cohort event-type count matrix (the wide-format
    // reporting op; rollup/cube's sibling). Explicit pivot values keep
    // the schema static — at scale an unbounded pivot is a driver-side
    // distinct collect you don't want. Absent cells coalesce to 0 so the
    // engines agree.
    Q("q32_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.events(s, d)
          .select((col("user_id") % 10).as("cohort"), col("event_type"))
          .groupBy("cohort").pivot("event_type", types).agg(count(lit(1)))
        types.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
          .orderBy("cohort")
      },
      Some("""SELECT user_id % 10 AS cohort,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Grouping sets (the third of the rollup/cube/grouping-sets trio):
    // per-flag and per-status margins plus the grand total in ONE
    // aggregation pass — no union of scans.
    Q("q33_grouping_sets",
      (s, d) => Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_extendedprice"), 2).as("rev"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS rev,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Rollup (free analytics layer on top of the A-series aggregates).
    Q("q24_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_extendedprice"), 2).as("rev"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) AS rev,
             | count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Distinct count over a trailing range window (unique event types a
    // user produced in the last 100 event ids — the sliding-cardinality
    // shape of sessionized feature engineering). Spark has no
    // count(DISTINCT) window function; size(collect_set() OVER) is the
    // idiomatic equivalent and stays a single window pass. State per row
    // is bounded by the type cardinality (5 here), not the frame width —
    // for high-cardinality columns the scale path is the approximate
    // sketch, traded here for exactness the oracle can hash.
    Q("q34_sliding_distinct",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id").rangeBetween(-100, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            size(collect_set(col("event_type")).over(w)).cast("long").as("n_types"))
          .filter(col("n_types") > 0)
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, n_types FROM (
             | SELECT user_id, event_id,
             |  count(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY event_id
             |    RANGE BETWEEN 100 PRECEDING AND 1 PRECEDING)::BIGINT AS n_types
             | FROM events) t
             |WHERE n_types > 0 ORDER BY user_id, event_id""".stripMargin)),

    // Cohort retention — the classic product-analytics rollup: users are
    // cohorted by first-event day, then each (cohort, week-offset) cell
    // counts distinct returning users. Two shuffles total: the first-event
    // agg partitions by user_id and the join reuses that partitioning (no
    // re-shuffle of the aggregated side); the final cell agg is partial-
    // aggregated map-side. At 100 TB the user dimension is the natural
    // partitioning key for the whole family of per-user rollups.
    Q("q35_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(Tables.tsFromNanos(col("ts"))).as("day"))
        val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
        ev.join(first, "user_id")
          // DATE surfaces as different physical types across engines —
          // format to a string for the driver's hash compare (n13 lesson)
          .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
            expr("cast(datediff(day, cohort_day) div 7 as int)").as("week_offset"))
          .agg(countDistinct("user_id").as("n_active"),
               count(lit(1)).as("n_events"))
          .orderBy("cohort_day", "week_offset")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
             |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
             |  CAST(date_diff('day', cohort_day, day) // 7 AS INT) AS week_offset,
             |  count(DISTINCT user_id) AS n_active, count(*) AS n_events
             |FROM ev JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ORC as a second columnar at-rest format: convert the documents
    // table to ORC (fixed per-process path, overwritten — no /tmp
    // growth), read it back through Spark's native ORC source (column
    // pruning + predicate pushdown apply exactly as for parquet), and
    // aggregate. The oracle reads the SAME rows from parquet, so the
    // gate proves the ORC write→read roundtrip is lossless — the "can I
    // point this engine at the lake's other format" answer.
    Q("q36_orc_source",
      (s, d) => {
        val dir = graft.sources.TmpDirs.scratch(
          s"/tmp/graft_orc/documents-${ProcessHandle.current().pid()}")
        Tables.documents(s, d).write.mode("overwrite").orc(dir)
        s.read.orc(dir)
          .filter(col("n_chars") > 100)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               sum("n_chars").as("sum_chars"),
               min("doc_id").as("min_doc"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS min_doc
             |FROM documents WHERE n_chars > 100
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Runtime Bloom-filter join pruning: the filtered dim's keys are
    // sketched into a 16 KB bitset (distributed build, mergeable OR-agg —
    // operators/Bloom.scala) and the fact scan drops non-member rows
    // BEFORE the join shuffle. At 100 TB this is the difference between
    // shuffling 600 B rows and shuffling the ~10% that can match; false
    // positives only re-admit rows the exact join then drops, so the
    // result — and the oracle — is the plain join (BloomSpec asserts the
    // no-false-negative and fpp properties directly).
    Q("q37_bloom_join",
      (s, d) => {
        val dim = Tables.part(s, d).filter(col("p_size") <= 5)
        val bits = graft.operators.Bloom.build(dim.select("p_partkey"), "p_partkey")
        Tables.lineitem(s, d)
          .filter(graft.operators.Bloom.mightContain(bits, col("l_partkey")))
          .join(dim, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size <= 5 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bucketed co-located join: both sides written bucketBy(8) on the join
    // key (hash-partitioned AT REST), read back through the catalog and
    // joined WITHOUT a shuffle — each task zips bucket i with bucket i
    // (PartitioningSpec asserts the exchange-free physical plan). At 100 TB
    // this is how a fact table joined daily on the same key amortizes its
    // shuffle to zero: pay the partitioning once at ingest, never at read.
    // The write is inside the measured query on purpose — the bench's
    // first/steady split shows ingest vs read-path cost honestly.
    Q("q38_bucket_join",
      (s, d) => {
        // table names pid-suffixed like the path: concurrent JVMs sharing a
        // warehouse can't clobber each other's catalog entries (r6 advice)
        val pid = ProcessHandle.current().pid()
        val base = graft.sources.TmpDirs.scratch(s"/tmp/graft_bucketed/p$pid")
        val liTable = s"graft_li_bucketed_p$pid"
        val ordTable = s"graft_ord_bucketed_p$pid"
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_extendedprice")
          .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$base/lineitem").saveAsTable(liTable)
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$base/orders").saveAsTable(ordTable)
        s.table(liTable)
          .join(s.table(ordTable),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum("l_quantity").as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items, sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Z-order (Morton) clustering key: interleave the bits of two
    // dimensions so a 1-D sort keeps 2-D locality — range-partitioning the
    // at-rest layout by zkey gives every file a tight bounding box in BOTH
    // columns, so parquet min/max stats prune box predicates on either
    // (PartitioningSpec measures the bound tightening vs a 1-D sort).
    // Pure shift/mask expressions, exactly mirrored in integer SQL.
    Q("q39_zorder_key",
      (s, d) => {
        val e = Tables.events(s, d).select(col("event_id"),
          (col("user_id") % 1024).as("x"),
          ((col("event_id") * 31) % 1024).as("y"))
        e.withColumn("zkey",
            graft.operators.Partitioning.zorderKey(10, col("x"), col("y")))
          .orderBy("zkey", "event_id").limit(100)
      },
      Some {
        val terms = (for (b <- 0 until 10; (c, dim) <- Seq(("x", 0), ("y", 1)))
          yield s"((($c >> $b) & 1) << ${b * 2 + dim})").mkString(" + ")
        s"""WITH e AS (SELECT event_id, user_id % 1024 AS x,
           |  (event_id * 31) % 1024 AS y FROM events)
           |SELECT event_id, x, y, CAST($terms AS BIGINT) AS zkey
           |FROM e ORDER BY zkey, event_id LIMIT 100""".stripMargin
      }),

    // Time-grid RESAMPLING + forward fill — the feature-pipeline gap
    // filler (sensor dropout, silent days): each user's sparse daily
    // readings expand onto their full [first, last] day grid (`sequence`
    // + explode — per-key bounded by the key's own time span, never a
    // global cross join) and missing days carry the last observed value
    // forward via an ignore-nulls window. Readings are integer-quantized
    // so carried values compare exactly cross-engine.
    Q("q46_gap_fill",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(Tables.tsFromNanos(col("ts"))).as("day"),
            col("event_id"), floor(col("value") * 1000).cast("long").as("v_milli"))
        val daily = ev.groupBy("user_id", "day")
          .agg(expr("max_by(v_milli, event_id)").as("v_milli"))
          // daily feeds the grid AND the join; without materialization
          // the events scan+agg re-executes per consumer (the d08
          // lesson — measured: sf10 16.1 s unchecked vs 5.2 s, sf0.1
          // parity at 0.70 s)
          .localCheckpoint(true)
        // derive the per-user day span from the ALREADY-AGGREGATED daily
        // frame (users x days rows), not a second 60M-row events scan —
        // min/max over days-present is identical either way
        val grid = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("v_milli").isNotNull.as("observed"),
            last("v_milli", ignoreNulls = true).over(w).as("v_milli"))
          .orderBy("user_id", "day")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, event_id,
             |    CAST(floor(value * 1000) AS BIGINT) AS v_milli FROM events),
             |daily AS (
             |  SELECT user_id, day, arg_max(v_milli, event_id) AS v_milli
             |  FROM ev GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id, unnest(generate_series(min(day), max(day),
             |    INTERVAL 1 DAY))::DATE AS day
             |  FROM ev GROUP BY user_id)
             |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
             |  d.v_milli IS NOT NULL AS observed,
             |  last_value(d.v_milli IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_milli
             |FROM grid g LEFT JOIN daily d USING (user_id, day)
             |ORDER BY 1, 2""".stripMargin)),

    // Incremental aggregate maintenance — the materialized-view refresh
    // pattern (d13's exact-dedup sibling for AGGREGATES): a nightly delta
    // (~25% hash split) must update per-source stats WITHOUT rescanning
    // history. Counts/sums/min are algebraic, so the refresh is
    // agg(history) ⊎ agg(delta) re-aggregated — the merge runs on TWO
    // aggregate rows per source, never the data — and avg is derived
    // from maintained sum/count at read time (never averaged averages).
    // The oracle recomputes from scratch over the full table: merged
    // refresh == full recompute, row for row.
    Q("q43_incremental_agg",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val isNew = substring(md5(col("text")), 1, 1) < "4"
        def partial(df: DataFrame) = df.groupBy("source")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
            min("doc_id").as("min_doc"))
        partial(docs.filter(!isNew)).unionByName(partial(docs.filter(isNew)))
          .groupBy("source")
          .agg(sum("n").cast("long").as("n_docs"),
            sum("sum_chars").cast("long").as("sum_chars"),
            min("min_doc").as("min_doc"))
          .withColumn("avg_chars_milli",
            expr("sum_chars * 1000 div n_docs"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS min_doc,
             |  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT) AS avg_chars_milli
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Small-file COMPACTION — lake maintenance: a landing zone written in
    // many tiny files (64 here, simulating per-task/per-trigger output)
    // is rewritten into a few right-sized ones. The rewrite is a plain
    // read → repartition(4) → write (at scale: target bytes/file via
    // maxRecordsPerFile or repartitionByRange on the layout key); the
    // gate proves the compaction is content-lossless by aggregating the
    // compacted copy against the original table's oracle, and the file
    // counts are asserted in-query so a silent no-op compaction fails.
    Q("q44_compaction",
      (s, d) => {
        val base = graft.sources.TmpDirs.scratch(
          s"/tmp/graft_compact/p${ProcessHandle.current().pid()}")
        Tables.documents(s, d).repartition(64)
          .write.mode("overwrite").parquet(s"$base/landing")
        def files(p: String): Long =
          s.read.parquet(p).select(input_file_name()).distinct().count()
        val before = files(s"$base/landing")
        s.read.parquet(s"$base/landing").repartition(4)
          .write.mode("overwrite").parquet(s"$base/compacted")
        val after = files(s"$base/compacted")
        require(before >= 60 && after <= 4, s"compaction no-op: $before -> $after")
        s.read.parquet(s"$base/compacted")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // FULL OUTER join — the one join type the catalog lacked (inner q06,
    // broadcast q07, left/lag q08, anti q19, semi q20, as-of q28, range
    // q29): users who clicked vs users who purchased, keeping both
    // unmatched sides with explicit zero-fill.
    Q("q45_full_outer",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("cu")).agg(count(lit(1)).as("n_clicks"))
        val buys = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("bu")).agg(count(lit(1)).as("n_buys"))
        clicks.join(buys, col("cu") === col("bu"), "full_outer")
          .select(coalesce(col("cu"), col("bu")).as("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_buys"), lit(0L)).as("n_buys"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id AS cu, count(*) AS n_clicks FROM events
             |  WHERE event_type = 'click' GROUP BY 1),
             |b AS (SELECT user_id AS bu, count(*) AS n_buys FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT coalesce(cu, bu) AS user_id,
             |  coalesce(n_clicks, 0) AS n_clicks, coalesce(n_buys, 0) AS n_buys
             |FROM c FULL OUTER JOIN b ON cu = bu ORDER BY 1""".stripMargin)),

    // Correlated-subquery pattern, decorrelated: "parts priced above
    // their brand's average" — the classic `WHERE price > (SELECT avg …
    // WHERE brand = outer.brand)` rewritten as the join-with-grouped-agg
    // Catalyst produces anyway, with the threshold integer-quantized so
    // the comparison is exact cross-engine. The oracle keeps the
    // correlated-subquery spelling — proving the decorrelated plan
    // computes the same relation.
    Q("q48_above_avg",
      (s, d) => {
        val p = Tables.part(s, d)
          .withColumn("price_milli", floor(col("p_retailprice") * 1000).cast("long"))
        val brandAvg = p.groupBy(col("p_brand").as("b"))
          .agg(expr("sum(price_milli) div count(1)").as("avg_milli"))
        p.join(broadcast(brandAvg), col("p_brand") === col("b"))
          .filter(col("price_milli") > col("avg_milli"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_above"), max("price_milli").as("max_milli"))
          .orderBy("p_brand")
      },
      Some("""WITH p AS (SELECT p_brand, p_partkey,
             |    CAST(floor(p_retailprice * 1000) AS BIGINT) AS price_milli FROM part)
             |SELECT p_brand, count(*) AS n_above, max(price_milli) AS max_milli
             |FROM p o
             |WHERE price_milli > (SELECT sum(price_milli) // count(*) FROM p i
             |                     WHERE i.p_brand = o.p_brand)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CDC changelog apply (the lakehouse MERGE-INTO / SCD-1 core — q43
    // maintains an AGGREGATE incrementally; this maintains the ROW
    // STATE): orders replay as a per-customer change stream ordered by
    // (o_orderdate, o_orderkey) — status 'F' rows are DELETEs, the rest
    // UPSERT the balance — applied onto the customer snapshot.
    // Latest-wins compaction is ONE struct-max aggregate (max on the
    // (date, orderkey, op, value) struct — map-side combined, one row
    // per touched key on the shuffle, NO per-key sort window: the
    // RocksDB-compaction shape, and exactly how a 100 TB MERGE batches:
    // compact the delta to latest-per-key, then one keyed join against
    // the bucketed snapshot). Balances are integer cents so the merged
    // state hash-compares.
    Q("q49_cdc_upsert",
      (s, d) => cdcMerge(cdcSnapshot(s, d),
        cdcChangeStruct(Tables.orders(s, d))
          .groupBy("key").agg(max(col("ch")).as("last"))),
      Some(cdcOracleSql)),

    // Windowed z-score ANOMALY detection — the monitoring/feature shape:
    // each reading scores against its own trailing 20-event window. The
    // moments come from exact integer sums (the n08 trick), so
    // z = (v·n − s) / √(n·q − s²) is one IEEE sqrt + one division over
    // integers both engines computed identically — the 4dp-rounded score
    // hash-compares. Constant windows (zero variance) are excluded by an
    // integer predicate, not a float epsilon. Streaming twin: the same
    // expression over a watermarked sliding window.
    Q("q47_zscore_anomaly",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-20, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("v"))
          .select(col("user_id"), col("event_id"), col("v"),
            count(col("v")).over(w).as("n"),
            sum(col("v")).over(w).as("sv"),
            sum(col("v") * col("v")).over(w).as("sq"))
          .filter(col("n") === 20 && col("n") * col("sq") > col("sv") * col("sv"))
          .withColumn("z_raw",
            (col("v") * col("n") - col("sv")) /
              sqrt((col("n") * col("sq") - col("sv") * col("sv")).cast("double")))
          // threshold on the RAW score (as the oracle does), round only
          // for the output hash
          .filter(abs(col("z_raw")) > lit(2.5))
          .select(col("user_id"), col("event_id"), col("v"),
            round(col("z_raw"), 4).as("z"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH q AS (
             |  SELECT user_id, event_id, CAST(floor(value * 1000) AS BIGINT) AS v
             |  FROM events),
             |m AS (
             |  SELECT user_id, event_id, v,
             |    count(v) OVER w AS n, sum(v) OVER w AS sv, sum(v * v) OVER w AS sq
             |  FROM q
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
             |SELECT user_id, event_id, v,
             |  round((v * n - sv) / sqrt(CAST(n * sq - sv * sv AS DOUBLE)), 4) AS z
             |FROM m
             |WHERE n = 20 AND n * sq > sv * sv
             |  AND abs((v * n - sv) / sqrt(CAST(n * sq - sv * sv AS DOUBLE))) > 2.5
             |ORDER BY 1, 2""".stripMargin)),

    // UNPIVOT — q32's inverse (wide → long), closing the reshape pair: a
    // metrics table with one column per measure melts back to
    // (key, measure, value) rows via `stack`, a generate-side expression
    // that multiplies rows WITHOUT a shuffle (the melt happens inside the
    // scan stage; the only exchange is q32's original cohort agg). The
    // round-trip through wide form is the gate's proof the reshape is
    // lossless: the oracle computes the long form directly.
    Q("q42_unpivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = Tables.events(s, d)
          .select((col("user_id") % 10).as("cohort"), col("event_type"))
          .groupBy("cohort").pivot("event_type", types).agg(count(lit(1)))
        val filled = types.foldLeft(wide)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L))))
        val stackArgs = types.map(t => s"'$t', `$t`").mkString(", ")
        filled.select(col("cohort"),
            expr(s"stack(${types.length}, $stackArgs) as (event_type, n)"))
          .filter(col("n") > 0)
          .orderBy("cohort", "event_type")
      },
      Some("""SELECT user_id % 10 AS cohort, event_type, count(*) AS n
             |FROM events GROUP BY 1, 2 HAVING count(*) > 0
             |ORDER BY 1, 2""".stripMargin)),

    // JSON-lines as a text interchange format (the third at-rest format
    // after parquet and q36's ORC): write documents as JSONL, read back
    // with an EXPLICIT schema — schema inference would cost a full extra
    // pass over 100 TB; a declared schema makes the JSON scan one pass
    // with column pruning — and aggregate. The oracle reads the same rows
    // from parquet, so the gate proves the JSON write→read roundtrip is
    // lossless (quoting/escaping included).
    Q("q41_jsonl_source",
      (s, d) => {
        val dir = graft.sources.TmpDirs.scratch(
          s"/tmp/graft_jsonl/documents-${ProcessHandle.current().pid()}")
        Tables.documents(s, d).write.mode("overwrite").json(dir)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
        s.read.schema(schema).json(dir)
          .filter(col("n_chars").between(50, 2000))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
               sum(length(col("text"))).as("sum_text_len"),
               min("doc_id").as("min_doc"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len, min(doc_id) AS min_doc
             |FROM documents WHERE n_chars BETWEEN 50 AND 2000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Integer-exact PageRank (5 power iterations) over the undirected
    // part↔supplier graph — iterative numeric graph analytics joining
    // d04's label-propagation components. Milli-mass integer arithmetic
    // makes the fixpoint bit-identical across partitionings and engines;
    // the oracle replays the exact iterations as 5 generated SQL layers.
    Q("q40_pagerank",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = li.union(li.select(col("dst").as("src"), col("src").as("dst")))
        // everyNodeReceives: the union with the reversed copy makes the
        // edge list symmetric, so every node has an in-edge — the
        // per-iteration nodes LEFT JOIN is the identity and drops out
        // (PageRankSpec pins the two forms bit-equal; the oracle keeps
        // the LEFT JOIN formulation)
        graft.operators.PageRank.run(edges, "src", "dst", iters = 5,
          everyNodeReceives = true)
          .orderBy(desc("mass"), asc("node")).limit(40)
          .select(col("node"), col("mass").as("mass_milli"))
      },
      Some {
        val layers = (1 to 5).map { i =>
          s"""m$i AS (
             |  SELECT n.node, CAST(150 + COALESCE(s.in_mass, 0) AS BIGINT) AS mass
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst AS node,
             |      CAST(SUM(m.mass * 850 // (1000 * d.outdeg)) AS BIGINT) AS in_mass
             |    FROM e JOIN deg d USING (src) JOIN m${i - 1} m ON m.node = e.src
             |    GROUP BY e.dst) s USING (node))""".stripMargin
        }.mkString(",\n")
        s"""WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM lineitem),
           |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS node FROM e),
           |m0 AS (SELECT node, CAST(1000 AS BIGINT) AS mass FROM nodes),
           |$layers
           |SELECT node, mass AS mass_milli FROM m5
           |ORDER BY mass DESC, node LIMIT 40""".stripMargin
      })
  )
}
