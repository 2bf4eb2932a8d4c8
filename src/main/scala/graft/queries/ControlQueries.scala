package graft.queries

import graft.{Q, Tables}
import graft.control._
import graft.operators.Tracking
import graft.ops.TaskSim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Control-plane + tracking catalog: the video-ETL domain operators
  * (SORT tracking ST1, static/skyscraper replay ST6/Q1, task-graph
  * simulation X1, LP knob planning X2) driven from the testdata tables.
  *
  * Streams are synthesized deterministically from `events` (stream =
  * user_id % 4) so everything scales with the input and stays
  * oracle-comparable where SQL-expressible.
  */
object ControlQueries {

  // ---- shared adapters --------------------------------------------------

  /** Per-chunk score vectors: stream count scales with data volume
    * (count/2500 streams → ~2500 chunks per stream at every SF — streams
    * are the parallel axis, per-stream sequences stay bounded), chunk =
    * per-stream ordinal, 3 knob-config quality columns derived from
    * `value`.
    */
  private[queries] def chunkScores(s: SparkSession, d: String): DataFrame = {
    val nStreams = math.max(Tables.eventCount(s, d) / 2500L, 1L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stream_id").orderBy("event_id")
    Tables.events(s, d)
      .select(
        (col("user_id") % nStreams).as("stream_id"), col("event_id"),
        (round(col("value")) % 100 / 100.0).as("s0"))
      .withColumn("chunk_id", row_number().over(w).cast("long") - 1)
      .select(col("stream_id"), col("chunk_id"),
        col("s0"), (col("s0") * 0.8 + 0.1).as("s1"), (col("s0") * 0.5).as("s2"))
  }
  private val chunkScoresSql =
    """SELECT user_id % ns AS stream_id,
      |  row_number() OVER (PARTITION BY user_id % ns ORDER BY event_id) - 1 AS chunk_id,
      |  (round(value) % 100) / 100.0 AS s0,
      |  ((round(value) % 100) / 100.0) * 0.8 + 0.1 AS s1,
      |  ((round(value) % 100) / 100.0) * 0.5 AS s2
      |FROM events, (SELECT greatest(count(*) // 2500, 1) AS ns FROM events) nrm""".stripMargin

  /** LIVE DuckDB oracle for the full skyscraper replay (n02 and its
    * streaming twin n16): the whole per-chunk decision fold — content
    * categorization, drift-argmax, priority-list scan under buffer
    * admission, and the bug-for-bug buffer drain — re-executed as a
    * recursive CTE over the raw events parquet, one iteration per chunk
    * (the t19 loop-unroll technique).
    *
    * The one piece not re-run per planning round is the simplex itself:
    * the LP's optimum is DERIVED in SQL instead. For this instance the
    * budget row is provably slack for ANY mixture on the simplex
    * (max on-prem runtime × horizon = 164160 ≤ budget 172900 — the
    * `budget_ok` guard recomputes that inequality from the profile
    * literals), so the unique LP optimum puts each category's whole
    * ratio on its max-quality config (`lp_cfg` = per-category argmax of
    * the quality centers). Both preconditions are checked LIVE: if the
    * budget guard fails, or any non-bootstrap planning histogram has a
    * zero entry (the one case where the LP becomes degenerate and the
    * one-hot derivation unsound), the affected rows are poisoned and
    * the gate fails loudly. Exact-match evidence: bit-identical to the
    * Spark output on all 10,000 sf0.01 rows (round-9 session).
    */
  private[queries] val skyscraperReplayOracle: String =
    """WITH RECURSIVE
      |chunks AS MATERIALIZED (
      |  SELECT user_id % ns AS stream_id,
      |    row_number() OVER (PARTITION BY user_id % ns ORDER BY event_id) - 1 AS chunk_id,
      |    (round(value) % 100) / 100.0 AS s0,
      |    ((round(value) % 100) / 100.0) * 0.8 + 0.1 AS s1,
      |    ((round(value) % 100) / 100.0) * 0.5 AS s2
      |  FROM events, (SELECT greatest(count(*) // 2500, 1) AS ns FROM events) nrm
      |),
      |profiles(placement, config, rt, cost, sz) AS (VALUES
      |  (0, 0, 1.9, 0.0, 100.0), (1, 0, 1.4, 4.0, 100.0), (2, 0, 1.0, 8.0, 100.0),
      |  (3, 1, 1.5, 0.0,  80.0), (4, 1, 1.1, 3.0,  80.0), (5, 1, 0.8, 6.0,  80.0),
      |  (6, 2, 1.2, 0.0,  60.0), (7, 2, 0.9, 2.0,  60.0), (8, 2, 0.7, 4.0,  60.0)),
      |consts AS (
      |  SELECT [[0.20, 0.25, 0.15], [0.50, 0.55, 0.45], [0.80, 0.85, 0.75]]::DOUBLE[][] AS centers,
      |    (SELECT max(rt) * 86400 <= 172900.0 FROM profiles WHERE cost = 0) AS budget_ok,
      |    400.0 / ((SELECT max(sz) FROM profiles) / 2.0) AS time_cap
      |),
      |prio AS (
      |  SELECT cat,
      |    list(config ORDER BY ord) AS p_cfg, list(placement ORDER BY ord) AS p_place,
      |    list(cost ORDER BY ord) AS p_cost, list(rt ORDER BY ord) AS p_rt,
      |    list(sz ORDER BY ord) AS p_sz,
      |    list_position(q, list_max(q)) - 1 AS lp_cfg
      |  FROM (
      |    SELECT c.cat, c.q, p.*,
      |      row_number() OVER (PARTITION BY c.cat
      |        ORDER BY -c.q[p.config + 1], p.config, p.cost, p.placement, p.rt) AS ord
      |    FROM (SELECT cat, centers[cat + 1] AS q
      |          FROM consts, unnest(range(3)) AS r(cat)) c
      |    CROSS JOIN profiles p
      |  ) GROUP BY cat, q
      |),
      |step AS (
      |  SELECT c.stream_id, c.chunk_id,
      |    0 AS config, 0 AS placement, 0.0 AS cloud_cost, 0.0 AS runtime_s,
      |    c.s0 AS score_raw,
      |    0 AS cur_knob, 0 AS counter, c.s0 AS cur_score,
      |    [1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0]::DOUBLE[] AS used,
      |    [0.0,0.0,0.0]::DOUBLE[] AS catc,
      |    []::DOUBLE[] AS buf_sz, []::DOUBLE[] AS buf_t,
      |    false AS poison
      |  FROM chunks c WHERE c.chunk_id = 0
      |  UNION ALL
      |  SELECT stream_id, c_chunk_id,
      |    chosen_cfg, chosen_place, chosen_cost, chosen_rt,
      |    score_new,
      |    chosen_cfg, counter + 1, score_new,
      |    list_transform(range(9), k ->
      |      u0[k + 1] + CASE WHEN k = (dyn - 1) * 3 + chosen_cfg THEN 1.0 ELSE 0.0 END),
      |    list_transform(range(3), k ->
      |      catc0[k + 1] + CASE WHEN k = dyn - 1 THEN 1.0 ELSE 0.0 END),
      |    CASE WHEN len(kept_t) > 0 AND processed > 0
      |         THEN list_prepend(kept_sz[1] * (kept_t[1] - 2.0) / kept_t[1], kept_sz[2:])
      |         ELSE kept_sz END,
      |    CASE WHEN len(kept_t) > 0 AND processed > 0
      |         THEN list_prepend(kept_t[1] - 2.0, kept_t[2:])
      |         ELSE kept_t END,
      |    poison2
      |  FROM (
      |    SELECT *, 2.0 - (CASE WHEN pops = 0 THEN 0.0 ELSE cum[pops] END) AS processed,
      |           t1[pops + 1:] AS kept_t, sz1[pops + 1:] AS kept_sz
      |    FROM (
      |      SELECT *,
      |        coalesce(list_min(list_filter(range(1, len(cum) + 1), k -> cum[k] > 2.0)) - 1,
      |                 len(cum)) AS pops
      |      FROM (
      |        SELECT *, list_transform(range(1, len(t1) + 1), k -> list_sum(t1[1:k])) AS cum
      |        FROM (
      |          SELECT *,
      |            list_append(sz0, p_sz[scan_idx]) AS sz1,
      |            list_append(bt0, p_rt[scan_idx]) AS t1,
      |            p_cfg[scan_idx] AS chosen_cfg, p_place[scan_idx] AS chosen_place,
      |            p_cost[scan_idx] AS chosen_cost, p_rt[scan_idx] AS chosen_rt,
      |            CASE p_cfg[scan_idx] WHEN 0 THEN s0 WHEN 1 THEN s1 ELSE s2 END AS score_new,
      |            (poison1 OR scan_idx IS NULL) AS poison2
      |          FROM (
      |            SELECT *,
      |              list_min(list_filter(range(1, 10), k ->
      |                k >= list_position(p_cfg, knob_place)
      |                AND coalesce(list_sum(bt0), 0.0) + p_rt[k] <= time_cap)) AS scan_idx
      |            FROM (
      |              SELECT *,
      |                list_position(ratio_err, list_max(ratio_err)) - 1 AS knob_place
      |              FROM (
      |                SELECT *,
      |                  list_transform(range(3), j ->
      |                    (CASE WHEN j = lp_cfg THEN 1.0 ELSE 0.0 END)
      |                    - u0[(dyn - 1) * 3 + j + 1] / used_sum) AS ratio_err
      |                FROM (
      |                  SELECT *,
      |                    u0[(dyn - 1) * 3 + 1] + u0[(dyn - 1) * 3 + 2] + u0[(dyn - 1) * 3 + 3] AS used_sum
      |                  FROM (
      |                    SELECT * FROM (
      |                    SELECT *, list_position(dlist, list_min(dlist)) AS dyn
      |                    FROM (
      |                      SELECT *,
      |                        list_transform(range(3), i ->
      |                          abs(centers[i + 1][cur_knob + 1] - cur_score)) AS dlist,
      |                        CASE WHEN planning THEN [1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0]::DOUBLE[] ELSE used END AS u0,
      |                        CASE WHEN planning THEN [0.0,0.0,0.0]::DOUBLE[] ELSE catc END AS catc0,
      |                        CASE WHEN planning AND len(buf_t) > 0
      |                             THEN list_prepend(buf_t[1] + 0.5, buf_t[2:])
      |                             ELSE buf_t END AS bt0,
      |                        buf_sz AS sz0,
      |                        (poison OR NOT budget_ok
      |                         OR (planning AND counter > 0 AND list_min(catc) <= 0.0)) AS poison1
      |                      FROM (
      |                        SELECT p.stream_id, c.chunk_id AS c_chunk_id,
      |                               c.s0, c.s1, c.s2,
      |                               (p.counter % 500 = 0) AS planning,
      |                               p.cur_knob, p.counter, p.cur_score, p.used, p.catc,
      |                               p.buf_sz, p.buf_t, p.poison,
      |                               k.centers, k.budget_ok, k.time_cap
      |                        FROM step p
      |                        JOIN chunks c ON c.stream_id = p.stream_id AND c.chunk_id = p.chunk_id + 1
      |                        CROSS JOIN consts k
      |                      ) x
      |                    ) x
      |                    ) y JOIN prio ON prio.cat = y.dyn - 1
      |                  ) x
      |                ) x
      |              ) x
      |            ) x
      |          ) x
      |        ) x
      |      ) x
      |    ) x
      |  ) x
      |)
      |SELECT stream_id, chunk_id, config, placement, cloud_cost::DOUBLE AS cloud_cost,
      |       round(runtime_s, 2)::DOUBLE AS runtime_s, round(score_raw, 4) AS score
      |FROM step WHERE NOT poison
      |ORDER BY stream_id, chunk_id""".stripMargin

  /** Deterministic linearly-moving detections derived from events (the
    * ST1 input adapter, shared by batch n01 and streaming n15): stream
    * count scales with volume (count/625 → 16 streams at the sf0.01
    * gate); per-stream video length stays 150 frames — streams are the
    * scale axis, matching real camera fleets.
    */
  private[queries] def sortDetections(s: SparkSession, d: String): DataFrame = {
    val nStreams = math.max(Tables.eventCount(s, d) / 625L, 1L)
    Tables.events(s, d)
      .select((col("user_id") % nStreams).as("stream_id"),
        (col("event_id") % 150).as("frame"),
        (col("user_id") % 3).as("obj"),
        col("event_id"))
      .groupBy("stream_id", "frame", "obj")
      .agg(min("event_id").as("eid"))
      .select(col("stream_id"), col("frame"),
        (lit(50.0) + col("frame") * 2.0 + col("obj") * 300.0 + (col("eid") % 5) * 0.5).as("x1"),
        (lit(100.0) + col("frame") * 1.5 + col("obj") * 50.0).as("y1"))
      .select(col("stream_id"), col("frame"), col("x1"), col("y1"),
        (col("x1") + 60.0).as("x2"), (col("y1") + 80.0).as("y2"), lit(0.9).as("score"))
  }

  /** The replay's operating points (FIXTURES.md A2 shape). */
  private val profileRows: IndexedSeq[Profile] = IndexedSeq(
    Profile(0, 0, 1.9, 0.0, 100), Profile(1, 0, 1.4, 4.0, 100), Profile(2, 0, 1.0, 8.0, 100),
    Profile(3, 1, 1.5, 0.0, 80), Profile(4, 1, 1.1, 3.0, 80), Profile(5, 1, 0.8, 6.0, 80),
    Profile(6, 2, 1.2, 0.0, 60), Profile(7, 2, 0.9, 2.0, 60), Profile(8, 2, 0.7, 4.0, 60))

  private val categoryCenters: Array[Array[Double]] = Array(
    Array(0.20, 0.25, 0.15), Array(0.50, 0.55, 0.45), Array(0.80, 0.85, 0.75))

  private[queries] def mkSwitcher(): Switcher = {
    val buffer = new SimBuffer(
      space = 400.0,
      sizePerConfig = profileRows.map(p => p.knobConfig -> p.sizeBytes).toMap)
    val knobCost = Array(1.9, 1.5, 1.2)
    val planner = new KnobPlanner(categoryCenters, knobCost,
      hoursPlanAhead = 24.0, timeInterval = 2.0)
    new Switcher(categoryCenters, profileRows, planner,
      planningInterval = 500, budget = 24 * 3600 * 2 + 100.0,
      bootstrapHistogram = Array(0.86, 0.053, 0.086), buffer = buffer)
  }

  val all: Seq[Q] = Seq(

    // ST6: static-baseline replay — per-stream totals with a profile
    // lookup join (oracle-checked; the stateless half of the sim layer).
    Q("c01_static_replay",
      (s, d) => {
        val profiles = s.createDataFrame(Seq(
          (0, 1.9), (1, 1.5), (2, 1.2))).toDF("config", "runtime")
        val chunks = chunkScores(s, d)
          .withColumn("config", (col("stream_id") % 3).cast("int"))
        chunks.join(broadcast(profiles), "config")
          .withColumn("score",
            when(col("config") === 0, col("s0"))
              .when(col("config") === 1, col("s1"))
              .otherwise(col("s2")))
          .groupBy("stream_id", "config", "runtime")
          .agg(count(lit(1)).as("n_chunks"),
               round(sum("score"), 4).as("sum_quality"),
               round(count(lit(1)) * lit(1.5e-4), 6).as("instance_cost"))
          .orderBy("stream_id")
      },
      Some(s"""WITH chunks AS ($chunkScoresSql),
              |prof(config, runtime) AS (VALUES (0, 1.9), (1, 1.5), (2, 1.2))
              |SELECT stream_id, config, runtime, count(*) AS n_chunks,
              |  round(sum(CASE WHEN config = 0 THEN s0
              |                 WHEN config = 1 THEN s1 ELSE s2 END), 4) AS sum_quality,
              |  round(count(*) * 1.5e-4, 6) AS instance_cost
              |FROM (SELECT c.*, CAST(stream_id % 3 AS INT) AS config FROM chunks c) t
              |JOIN prof USING (config)
              |GROUP BY 1, 2, 3 ORDER BY stream_id""".stripMargin)),

    // Q1: full skyscraper replay — buffer-admission + drift-argmax + LP
    // re-planning, one sequential switcher per stream, parallel across
    // streams. Semantics are spec-validated against the hand-derived
    // golden decision log (ReplaySpec / golden_skyscraper_log.csv); the
    // driver gate is a LIVE DuckDB recursive-CTE replay of the whole
    // decision fold since round 9 (skyscraperReplayOracle below) — the
    // t19 unroll technique applied to the per-chunk switcher loop.
    Q("n02_skyscraper_replay",
      (s, d) => {
        import s.implicits._
        chunkScores(s, d)
          .as[(Long, Long, Double, Double, Double)]
          .groupByKey(_._1)
          .flatMapSortedGroups($"chunk_id".asc) { (sid, it) =>
            val rows = it.map(r => (r._2, Array(r._3, r._4, r._5)))
            Replay.skyscraper(rows, mkSwitcher()).map(l =>
              (sid, l.chunkId, l.chosenConfig, l.chosenPlacement,
                l.cloudCost, math.rint(l.runtimeS * 100) / 100, math.rint(l.score * 10000) / 10000))
          }
          .toDF("stream_id", "chunk_id", "config", "placement", "cloud_cost", "runtime_s", "score")
          .orderBy("stream_id", "chunk_id")
      },
      Some(skyscraperReplayOracle)),

    // ST1: SORT tracking over deterministic linearly-moving objects
    // derived from events. Kernel semantics are spec-validated
    // (SortTrackerSpec brute-force parity, streaming==batch); the driver
    // gate is a LIVE DuckDB replay of the whole tracker fold since
    // round 10 — Kalman predict/update, IoU association, lifecycle — as
    // a recursive CTE (SortReplayOracle), bit-identical to this output.
    Q("n01_sort_tracks",
      (s, d) => {
        Tracking.track(sortDetections(s, d))
          .select(col("stream_id"), col("frame"), col("track_id"),
            round(col("x1"), 2).as("x1"), round(col("y1"), 2).as("y1"),
            round(col("x2"), 2).as("x2"), round(col("y2"), 2).as("y2"))
          .orderBy("stream_id", "frame", "track_id")
      },
      Some(SortReplayOracle.sql)),

    // X1: task-graph runtime/cost simulation — thousands of candidate
    // (graph, cores) points evaluated in parallel on executors.
    Q("n03_task_sim",
      (s, d) => {
        import s.implicits._
        // candidate grid driven by testdata so cardinality scales with SF
        val knobs = Tables.events(s, d)
          .select((col("event_id") % 4).as("k")).distinct()
          .collect().map(r => Seq(10, 20, 30, 60)(r.getLong(0).toInt))
        val specs = for (k <- knobs.toSeq.sorted; cores <- Seq(2, 4, 8, 16)) yield (k, cores)
        specs.toDS()
          .map { case (k, cores) =>
            val g = TaskSim.detectToTrack(k, 120)
            val (rt, cost) = (g.simulateRt(cores), g.simulateCost)
            (s"detect_to_track_$k", cores, rt, cost)
          }
          .toDF("graph_id", "cores", "runtime", "cost")
          .orderBy("graph_id", "cores")
      },
      // LIVE oracle since round 10 (was a literal snapshot): DuckDB
      // replays the whole list-scheduling fold as a recursive CTE — the
      // knob grid derived live from events (event_id % 4, as the query
      // does), and per (knob, cores) row the state {core queue, buffer
      // of (dispatchable, position, id) structs, running max finish}
      // advanced one scheduled task per iteration. The stable-sort
      // tie-break is reproduced exactly by sorting structs (bd, p, id)
      // — blocked tasks carry bd=1e18 so ready-before-blocked and
      // buffer-position ties match the Scala comparator; detectors pay
      // rtAll/cores on every core, trackers rtSingle on the first min
      // core. n03's graphs are all-on-prem (cost 0, no cloud ledger),
      // so the fold is exact IEEE double arithmetic — bit-identical to
      // TaskSim (all 16 rows; the ledger path stays pinned by the
      // bit-exact-vs-reference TaskSimSpec and n05's frozen points).
      Some("""WITH RECURSIVE
             |knobs AS (
             |  SELECT ([10,20,30,60])[k + 1] AS knob
             |  FROM (SELECT DISTINCT event_id % 4 AS k FROM events) t
             |),
             |spec AS (
             |  SELECT knob, cores, (knob + 1) * (120 // knob) AS n
             |  FROM knobs, (VALUES (2),(4),(8),(16)) c(cores)
             |),
             |init AS (
             |  SELECT knob, cores, n,
             |    list_transform(range(cores), c -> 0.0::DOUBLE) AS coreq,
             |    list_transform(range(n), i -> struct_pack(
             |      bd := CASE WHEN i % (knob + 1) = 0 THEN 0.0::DOUBLE ELSE 1e18::DOUBLE END,
             |      p := i::INT, id := i::INT)) AS rem,
             |    0.0::DOUBLE AS total
             |  FROM spec
             |),
             |sim AS (
             |  SELECT * FROM init
             |  UNION ALL
             |  SELECT knob, cores, n, coreq2 AS coreq,
             |    list_transform(range(len(tail)), i -> struct_pack(
             |      bd := CASE WHEN (tail[i + 1]).id = (hd).id + 1 AND ((hd).id + 1) % (knob + 1) <> 0
             |                 THEN fin ELSE (tail[i + 1]).bd END,
             |      p := i::INT, id := (tail[i + 1]).id)) AS rem,
             |    greatest(total, fin) AS total
             |  FROM (
             |    SELECT y.*,
             |      CASE WHEN (y.hd).id % (knob + 1) = 0
             |           THEN list_max(cq2d) ELSE cq1v END AS fin,
             |      CASE WHEN (y.hd).id % (knob + 1) = 0 THEN cq2d
             |           ELSE list_transform(range(cores), c ->
             |                  CASE WHEN c = cq1i THEN cq1v ELSE coreq[c + 1] END)
             |      END AS coreq2
             |    FROM (
             |      SELECT z.*, srt[1] AS hd, srt[2:] AS tail,
             |        list_transform(coreq, q -> greatest(srt[1].bd, q) + 1941.0 / cores) AS cq2d,
             |        (list_position(coreq, list_min(coreq)) - 1)::INT AS cq1i,
             |        greatest(srt[1].bd, list_min(coreq)) + 519.0 AS cq1v
             |      FROM (SELECT *, list_sort(rem) AS srt FROM sim WHERE len(rem) > 0) z
             |    ) y
             |  )
             |)
             |SELECT 'detect_to_track_' || knob AS graph_id, cores, total AS runtime, 0.0 AS cost
             |FROM sim WHERE len(rem) = 0
             |ORDER BY graph_id, cores""".stripMargin)),

    // X2: LP knob plan on the replay's literal dims (constraint-
    // satisfaction properties + vertex-enumeration parity in SimplexSpec;
    // the gate is a LIVE closed-form derivation since round 9).
    Q("n04_lp_plan",
      (s, d) => {
        val planner = new KnobPlanner(categoryCenters, Array(1.9, 1.5, 1.2),
          hoursPlanAhead = 24.0, timeInterval = 2.0)
        val (plan, score) = planner.plan(Array(0.86, 0.053, 0.086), 24 * 3600 * 2 + 100.0)
        val rows = for (i <- plan.indices; j <- plan(i).indices)
          yield (i, j, math.rint(plan(i)(j) * 10000) / 10000, math.rint(score * 100) / 100)
        s.createDataFrame(rows).toDF("category", "config", "ratio", "expected_score")
          .orderBy("category", "config")
      },
      // LIVE oracle since round 9 (was a literal snapshot): the LP's
      // optimum is DERIVED in SQL via the same slack-budget argument the
      // n02 replay oracle uses — for any mixture on the simplex the
      // horizon cost is at most max(knobCost)*86400 = 164160 < budget
      // 172900 (the guard recomputes that inequality), so the unique
      // optimum is each category's max-quality one-hot and the expected
      // score its mixture-weighted quality. The simplex must land
      // exactly there or the gate fails.
      Some("""WITH c AS (SELECT [[0.20,0.25,0.15],[0.50,0.55,0.45],[0.80,0.85,0.75]]::DOUBLE[][] AS q,
             |  [1.9,1.5,1.2]::DOUBLE[] AS kc, [0.86,0.053,0.086]::DOUBLE[] AS mraw,
             |  24*3600*2 + 100.0 AS budget),
             |n AS (SELECT q, kc, budget, list_transform(mraw, x -> x / list_sum(mraw)) AS m FROM c),
             |g AS (SELECT (list_max(kc) * 86400 <= budget) AS ok FROM n),
             |am AS (SELECT i::INT AS category, (list_position(q[i+1], list_max(q[i+1])) - 1)::INT AS best
             |       FROM n, unnest(range(3)) AS t(i)),
             |sc AS (SELECT round(list_sum(list_transform(range(3), i ->
             |         m[i+1] * q[i+1][list_position(q[i+1], list_max(q[i+1]))])) * 86400 / 2.0, 2) AS es FROM n)
             |SELECT a.category, j::INT AS config,
             |  CASE WHEN j = a.best THEN 1.0 ELSE 0.0 END AS ratio, sc.es AS expected_score
             |FROM am a, unnest(range(3)) t(j), sc, g WHERE g.ok
             |ORDER BY 1, 2""".stripMargin),
      ),

    // A8/X4 second half: eta calibration + per-group starting-point
    // election (knob_tuner.py:344-361) over per-stream (acc, cost)
    // samples. Per-video sums stay partition-local; spec-checked against
    // a driver brute force in OperatorSpecs.
    Q("n11_eta_election",
      (s, d) => {
        val samples = chunkScores(s, d)
          .select(col("stream_id"), col("chunk_id"),
            col("s0").as("acc"), (col("s1") + 0.5).as("cost"))
        graft.operators.KnobTuning
          .etaElection(samples, "stream_id", "chunk_id", "acc", "cost",
            samplesPerStart = 50, numEtas = 10, minEta = 0.1, maxEta = 10.0)
          .select(col("stream_id"), col("start_id"), col("best_idx"),
            round(col("eta"), 6).as("eta"), round(col("score"), 6).as("score"))
          .orderBy("stream_id", "start_id")
      },
      Some(s"""WITH chunks AS ($chunkScoresSql),
              |s AS (SELECT stream_id, chunk_id, s0 AS acc, s1 + 0.5 AS cost FROM chunks),
              |w AS (
              |  SELECT stream_id, chunk_id, acc, cost,
              |    sum(acc) OVER (PARTITION BY stream_id)
              |      / sum(cost) OVER (PARTITION BY stream_id) AS eta_fac,
              |    count(*) OVER (PARTITION BY stream_id) AS n
              |  FROM s),
              |sc AS (
              |  SELECT stream_id, chunk_id // 50 AS start_id, chunk_id,
              |    eta_fac*0.1 + floor(chunk_id*10/n) * (eta_fac*10 - eta_fac*0.1)/9 AS eta,
              |    acc - (eta_fac*0.1 + floor(chunk_id*10/n) * (eta_fac*10 - eta_fac*0.1)/9) * cost AS score
              |  FROM w),
              |rk AS (
              |  SELECT *, row_number() OVER (PARTITION BY stream_id, start_id
              |    ORDER BY score DESC, chunk_id ASC) AS r
              |  FROM sc)
              |SELECT stream_id, start_id, chunk_id AS best_idx,
              |  round(eta, 6) AS eta, round(score, 6) AS score
              |FROM rk WHERE r = 1 ORDER BY stream_id, start_id""".stripMargin),
      ),

    // X3: greedy knapsack fallback for the knob plan (knob_plan.py:135-177
    // — dead NotImplementedError sketch in the reference; paper supp. B).
    // LP-dominance + budget properties in KnobPlannerSpec; the gate is a
    // LIVE full enumeration of the 27 assignments since round 9.
    Q("n12_knapsack_plan",
      (s, d) => {
        val planner = new KnobPlanner(categoryCenters, Array(1.9, 1.5, 1.2),
          hoursPlanAhead = 24.0, timeInterval = 2.0)
        val mix = Array(0.86, 0.053, 0.086)
        val (plan, score) = planner.assignKnobsKnapsack(
          mix.map(_ / mix.sum), 24 * 3600 * 2 + 100.0)
        val rows = for (i <- plan.indices; j <- plan(i).indices)
          yield (i, j, plan(i)(j), math.rint(score * 100) / 100)
        s.createDataFrame(rows).toDF("category", "config", "ratio", "expected_score")
          .orderBy("category", "config")
      },
      // LIVE oracle since round 9 (was a literal snapshot): DuckDB
      // enumerates ALL 27 integral assignments from the center/cost
      // literals, filters budget-feasible, and takes the max-quality one
      // — an independent solve of the same knapsack instance (the greedy
      // must land on the enumeration optimum or the gate fails).
      Some("""WITH c AS (SELECT [[0.20,0.25,0.15],[0.50,0.55,0.45],[0.80,0.85,0.75]]::DOUBLE[][] AS q,
             |  [1.9,1.5,1.2]::DOUBLE[] AS kc, [0.86,0.053,0.086]::DOUBLE[] AS mraw,
             |  24*3600*2 + 100.0 AS budget, 24*3600.0 AS hz, 2.0 AS iv),
             |n AS (SELECT *, list_transform(mraw, x -> x / list_sum(mraw)) AS m FROM c),
             |combos AS (
             |  SELECT j0::INT AS j0, j1::INT AS j1, j2::INT AS j2,
             |    m[1]*kc[j0+1]*hz + m[2]*kc[j1+1]*hz + m[3]*kc[j2+1]*hz AS cost,
             |    m[1]*q[1][j0+1]*hz/iv + m[2]*q[2][j1+1]*hz/iv + m[3]*q[3][j2+1]*hz/iv AS qual,
             |    budget
             |  FROM n, unnest(range(3)) a(j0), unnest(range(3)) b(j1), unnest(range(3)) d(j2)),
             |best AS (SELECT * FROM combos WHERE cost <= budget
             |         ORDER BY qual DESC, j0, j1, j2 LIMIT 1)
             |SELECT i::INT AS category, j::INT AS config,
             |  CASE WHEN (i = 0 AND j = b.j0) OR (i = 1 AND j = b.j1) OR (i = 2 AND j = b.j2)
             |       THEN 1.0 ELSE 0.0 END AS ratio,
             |  round(b.qual, 2) AS expected_score
             |FROM best b, unnest(range(3)) t(i), unnest(range(3)) u(j)
             |ORDER BY 1, 2""".stripMargin),
      )
  )
}
