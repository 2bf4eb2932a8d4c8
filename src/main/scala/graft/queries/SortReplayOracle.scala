package graft.queries

/** LIVE DuckDB oracle for SORT tracking (n01 and its streaming twin n15):
  * the whole per-stream tracker fold — Kalman predict, NaN eviction, IoU
  * association (greedy partial-permutation shortcut, else optimal
  * assignment), Joseph-form update, track spawn, confirm/evict lifecycle —
  * re-executed as a recursive CTE over the raw events parquet, one
  * iteration per frame (the t19/n02/n03 loop-unroll technique applied to
  * ST1).
  *
  * The SQL is machine-printed by this object so that every arithmetic
  * expression mirrors `graft.ops.Kalman7` / `graft.ops.SortTracker`
  * token for token — same fixed association order (documented in
  * Kalman.scala), so the replay reproduces the Scala doubles bit for bit,
  * not just tolerance-close. Per-track state is a
  * STRUCT(id, tsu, hs, x DOUBLE[7], p DOUBLE[49 row-major]) list; the 4x4
  * innovation inverse is the same adjugate/cofactor expansion.
  *
  * Association branches (sort.py:163-190 semantics, SortTracker.scala:56-77):
  *  - the greedy branch (above-threshold matrix is a partial permutation)
  *    is replayed exactly;
  *  - the Hungarian branch is replayed as brute-force optimal assignment
  *    over all injective det→track maps (nd <= 3 structurally: the
  *    detection synthesizer emits one box per obj in {0,1,2}; a frame
  *    with nd > 3 poisons the row so the gate fails loudly). Ties between
  *    distinct optimal assignments break lexicographically, which is not
  *    guaranteed to match Hungarian's internal choice — measured: the
  *    branch fires 0 times at sf0.001/0.01/0.1, so no exercised path
  *    depends on it.
  */
object SortReplayOracle {

  private val TRACK = "STRUCT(id BIGINT, tsu BIGINT, hs BIGINT, x DOUBLE[], p DOUBLE[])"
  private val DETS = "STRUCT(x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE)"
  private val EMS = "STRUCT(tid BIGINT, b1 DOUBLE, b2 DOUBLE, b3 DOUBLE, b4 DOUBLE)"
  private val PAIR = "STRUCT(d BIGINT, t BIGINT)"

  // ---- tiny expression printers (all mirror Kalman7's index layout) ----

  /** predicted state vector from track ref `t` (mirrors SortTracker.predict:
    * vs zeroed when x(6)+x(2) <= 0, then x = Fx).
    */
  private def predX(t: String): String = {
    val vs0 = s"(CASE WHEN ($t.x)[7] + ($t.x)[3] <= 0.0 THEN 0.0 ELSE ($t.x)[7] END)"
    s"[($t.x)[1] + ($t.x)[5], ($t.x)[2] + ($t.x)[6], ($t.x)[3] + $vs0, " +
      s"($t.x)[4], ($t.x)[5], ($t.x)[6], $vs0]"
  }

  /** predicted covariance: P <- FPF' + Q with F = I + shift(0..2 <- 4..6);
    * entry association (a = FP, then aF', then Q) mirrors Kalman7.predict.
    */
  private def predP(t: String): String = {
    def p(i: Int, j: Int) = s"($t.p)[${i * 7 + j + 1}]"
    val qd = Array("1.0", "1.0", "1.0", "1.0", "0.01", "0.01", "0.0001")
    val es = for (k <- 0 until 49) yield {
      val i = k / 7; val j = k % 7
      val base =
        if (i < 3 && j < 3) s"(${p(i, j)} + ${p(i + 4, j)}) + (${p(i, j + 4)} + ${p(i + 4, j + 4)})"
        else if (i < 3) s"${p(i, j)} + ${p(i + 4, j)}"
        else if (j < 3) s"${p(i, j)} + ${p(i, j + 4)}"
        else p(i, j)
      if (i == j) s"($base) + ${qd(i)}" else base
    }
    es.mkString("[", ", ", "]")
  }

  /** bbox components 0..3 of state ref `x` (mirrors Kalman7.xToBbox). */
  private def bb(x: String, c: Int): String = {
    val w = s"sqrt(($x)[3] * ($x)[4])"
    c match {
      case 0 => s"($x)[1] - $w / 2.0"
      case 1 => s"($x)[2] - (($x)[3] / $w) / 2.0"
      case 2 => s"($x)[1] + $w / 2.0"
      case 3 => s"($x)[2] + (($x)[3] / $w) / 2.0"
    }
  }

  /** IoU of det ref `d` (struct) against track state ref `x` (mirrors
    * SortTracker.iou: inter / ((dArea + tArea) - inter)).
    */
  private def iou(d: String, x: String): String = {
    val (t1, t2, t3, t4) = (bb(x, 0), bb(x, 1), bb(x, 2), bb(x, 3))
    val w = s"greatest(0.0, least($d.x2, $t3) - greatest($d.x1, $t1))"
    val h = s"greatest(0.0, least($d.y2, $t4) - greatest($d.y1, $t2))"
    val inter = s"($w) * ($h)"
    val dA = s"($d.x2 - $d.x1) * ($d.y2 - $d.y1)"
    val tA = s"(($t3) - ($t1)) * (($t4) - ($t2))"
    s"($inter) / (($dA + $tA) - ($inter))"
  }

  /** observation [cx, cy, area, aspect] of det ref `d` (Kalman7.bboxToZ). */
  private def detZ(d: String): String = {
    val w = s"($d.x2 - $d.x1)"; val h = s"($d.y2 - $d.y1)"
    s"[$d.x1 + $w / 2.0, $d.y1 + $h / 2.0, $w * $h, $w / $h]"
  }

  /** 3x3 determinant with Kalman7.det3's association. */
  private def det3(e: IndexedSeq[String]): String = {
    val Seq(a, b, c, d, ee, f, g, h, iv) = e.toSeq
    s"(($a * ($ee * $iv - $f * $h)) - ($b * ($d * $iv - $f * $g))) + ($c * ($d * $h - $ee * $g))"
  }

  /** unsigned 3x3 minor of 4x4 list ref `s`, removing row r / col c. */
  private def minor(s: String, r: Int, c: Int): String = {
    val rs = (0 to 3).filter(_ != r); val cs = (0 to 3).filter(_ != c)
    det3(for (i <- rs; j <- cs) yield s"($s)[${i * 4 + j + 1}]")
  }

  /** det(S) via first-row cofactor expansion (Kalman7.det4). */
  private def det4(s: String): String =
    s"((($s)[1] * (${minor(s, 0, 0)}) - ($s)[2] * (${minor(s, 0, 1)})) + " +
      s"($s)[3] * (${minor(s, 0, 2)})) - ($s)[4] * (${minor(s, 0, 3)})"

  // ---- the oracle ------------------------------------------------------

  /** The shared replay engine: given CTEs that define a
    * `dets(stream_id, frame, x1, y1, x2, y2)` table (plus any helper
    * CTEs the caller needs downstream, e.g. per-frame scores) and a
    * final SELECT over the recursive `step` table
    * (stream_id, frame, em: [(tid, b1..b4)], poison), prints the full
    * WITH RECURSIVE query replaying the SORT fold over those detections.
    *
    * Layout note (why the update math runs on UNNESTED track rows): the
    * first cut kept per-track intermediates (S⁻¹, K, M) as stream-level
    * lists-of-lists, so every reference was a double extraction
    * `(ms[ti])[j]` — DuckDB copies the inner 49-double list per
    * reference, and with ~400 such references per track-frame the replay
    * cost ~160 s at sf0.01. Unnesting matched tracks to rows makes each
    * intermediate a per-row list (`mv[j]`: one extraction), then a
    * GROUP BY stream re-packs the updated states — same doubles, ~5x
    * cheaper. Only matched tracks take the trip; predict/associate/spawn/
    * emit stay at stream level where the whole track list is in scope.
    *
    * Frame-gap jump: when the live track set is EMPTY, every update on a
    * detection-less frame is a no-op (nothing to predict/age, nothing to
    * spawn or emit; frameCount is derived as fr - f0 + 1, not stored), so
    * the recursion jumps straight to the next detection frame instead of
    * stepping one frame at a time. With live tracks it still steps frame
    * by frame (aging/eviction are per-frame observable). This is what
    * makes the m05 sentinel gap (~30k empty frames) replayable in
    * O(det frames) iterations. The jump target comes from a precomputed
    * `skips` map instead of a per-iteration ASOF join (~25% cheaper):
    * the state can only be empty on a no-det frame (any detection spawns
    * a tsu=0 track that survives the same frame's eviction), and with
    * maxAge=1 the last track dies at most 2 frames past a det frame, so
    * the only possible jump origins are f0-1 (stream start) and
    * det_frame + 1/2 — a small equi-joinable key set.
    */
  private def engine(detsCtes: String, finalSelect: String): String = {
    // per-row refs in the unnested update pipeline
    def pp(i: Int, j: Int) = s"pp[${i * 7 + j + 1}]"
    def si(i: Int, j: Int) = s"si[${i * 4 + j + 1}]"
    def kv(i: Int, j: Int) = s"kv[${i * 4 + j + 1}]"
    def mv(i: Int, j: Int) = s"mv[${i * 7 + j + 1}]"
    def yv(i: Int) = s"y4[${i + 1}]"

    // S = P[0:4,0:4] + R (Kalman7.update)
    val rd = Array("1.0", "1.0", "10.0", "10.0")
    val ssList = (for (k <- 0 until 16) yield {
      val i = k / 4; val j = k % 4
      if (i == j) s"${pp(i, j)} + ${rd(i)}" else pp(i, j)
    }).mkString("[", ", ", "]")

    // S^-1 via adjugate: inv(i,j) = (+-minor(j,i)) / det (Kalman7.inv4)
    val sinvList = (for (k <- 0 until 16) yield {
      val i = k / 4; val j = k % 4
      val m = minor("s16", j, i)
      val signed = if (((i + j) & 1) == 0) s"($m)" else s"(-($m))"
      s"$signed / dt"
    }).mkString("[", ", ", "]")

    // K = P[:,0:4] * S^-1, 7x4, left-to-right 4-term dots
    val kList = (for (k <- 0 until 28) yield {
      val i = k / 4; val j = k % 4
      s"((${pp(i, 0)} * ${si(0, j)} + ${pp(i, 1)} * ${si(1, j)}) + " +
        s"${pp(i, 2)} * ${si(2, j)}) + ${pp(i, 3)} * ${si(3, j)}"
    }).mkString("[", ", ", "]")

    // x' = x + K y
    val x2List = (for (i <- 0 until 7) yield {
      s"px[${i + 1}] + (((${kv(i, 0)} * ${yv(0)} + ${kv(i, 1)} * ${yv(1)}) + " +
        s"${kv(i, 2)} * ${yv(2)}) + ${kv(i, 3)} * ${yv(3)})"
    }).mkString("[", ", ", "]")

    // M = (I-KH) P
    val mList = (for (k <- 0 until 49) yield {
      val i = k / 7; val j = k % 7
      s"${pp(i, j)} - (((${kv(i, 0)} * ${pp(0, j)} + ${kv(i, 1)} * ${pp(1, j)}) + " +
        s"${kv(i, 2)} * ${pp(2, j)}) + ${kv(i, 3)} * ${pp(3, j)})"
    }).mkString("[", ", ", "]")

    // P' = M (I-KH)' + K R K'  with R = diag(1,1,10,10)
    val p2List = (for (k <- 0 until 49) yield {
      val i = k / 7; val j = k % 7
      val n = s"${mv(i, j)} - (((${mv(i, 0)} * ${kv(j, 0)} + ${mv(i, 1)} * ${kv(j, 1)}) + " +
        s"${mv(i, 2)} * ${kv(j, 2)}) + ${mv(i, 3)} * ${kv(j, 3)})"
      val krk = s"((${kv(i, 0)} * ${kv(j, 0)} + ${kv(i, 1)} * ${kv(j, 1)}) + " +
        s"(${kv(i, 2)} * 10.0) * ${kv(j, 2)}) + (${kv(i, 3)} * 10.0) * ${kv(j, 3)}"
      s"($n) + ($krk)"
    }).mkString("[", ", ", "]")

    val yList = (0 until 4).map(i => s"z4[${i + 1}] - px[${i + 1}]")
      .mkString("[", ", ", "]")

    // spawn covariance diag(10,10,10,10,1e4,1e4,1e4), row-major 49
    val p0 = (for (k <- 0 until 49) yield {
      val i = k / 7
      if (k % 7 == i) (if (i < 4) "10.0" else "10000.0") else "0.0"
    }).mkString("[", ", ", "]")

    val nanBox = (0 to 3).map(c => s"isnan(${bb("t.x", c)})").mkString(" OR ")

    // brute-force optimal assignment (else branch; see scaladoc)
    val asgs =
      """flatten(list_transform(CASE WHEN nd >= 1 THEN range(0, nt + 1) ELSE [0] END, a1 ->
        |  flatten(list_transform(CASE WHEN nd >= 2 THEN range(0, nt + 1) ELSE [0] END, a2 ->
        |    list_transform(CASE WHEN nd >= 3 THEN range(0, nt + 1) ELSE [0] END, a3 ->
        |      [a1, a2, a3])))))""".stripMargin
    val validAsg =
      """a -> NOT ((a[1] > 0 AND a[1] = a[2]) OR (a[1] > 0 AND a[1] = a[3])
        |          OR (a[2] > 0 AND a[2] = a[3]))
        |  AND ((CASE WHEN a[1] > 0 THEN 1 ELSE 0 END + CASE WHEN a[2] > 0 THEN 1 ELSE 0 END)
        |       + CASE WHEN a[3] > 0 THEN 1 ELSE 0 END) = least(nd, nt)""".stripMargin
    val asgScore =
      """(CASE WHEN a[1] > 0 THEN (iouM[1])[a[1]] ELSE 0.0 END
        |  + CASE WHEN a[2] > 0 THEN (iouM[2])[a[2]] ELSE 0.0 END)
        |  + CASE WHEN a[3] > 0 THEN (iouM[3])[a[3]] ELSE 0.0 END""".stripMargin

    s"""WITH RECURSIVE
$detsCtes,
fdets AS MATERIALIZED (
  SELECT stream_id, frame,
    list(struct_pack(x1 := x1, y1 := y1, x2 := x2, y2 := y2)
         ORDER BY x1, y1, x2, y2) AS dl
  FROM dets GROUP BY 1, 2
),
bounds AS (SELECT stream_id, min(frame) AS f0, max(frame) AS f1 FROM dets GROUP BY 1),
skips AS MATERIALIZED (
  -- next det frame after every possible empty-state frame (see scaladoc);
  -- sorted distinct det frames mean the answer for origin df+k (k<=2) is
  -- always among the next three det frames after df
  -- min+GROUP BY dedups origins reachable from two det frames (df+2 of
  -- one is df+1 of the next): a duplicate key would multiply recursion
  -- rows exponentially
  SELECT stream_id, frame, min(nxt) AS nxt FROM (
    SELECT stream_id, df + o.k AS frame,
      CASE WHEN l1 > df + o.k THEN l1
           WHEN l2 > df + o.k THEN l2
           ELSE l3 END AS nxt
    FROM (
      SELECT stream_id, frame AS df,
        lead(frame, 1) OVER w AS l1, lead(frame, 2) OVER w AS l2,
        lead(frame, 3) OVER w AS l3
      FROM fdets
      WINDOW w AS (PARTITION BY stream_id ORDER BY frame)
    ) q, unnest([1, 2]) AS o(k)
    WHERE l1 IS NOT NULL
    UNION ALL
    SELECT stream_id, f0 - 1 AS frame, f0 AS nxt FROM bounds
  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
),
step AS (
  SELECT b.stream_id, b.f0, b.f1, b.f0 - 1 AS frame, CAST(0 AS BIGINT) AS next_id,
    CAST([] AS $TRACK[]) AS tracks, CAST([] AS $EMS[]) AS em, false AS poison
  FROM bounds b
  UNION ALL
  SELECT stream_id, f0, f1, fr AS frame, next_id + len(ud) AS next_id,
    list_filter(tracks2, t -> t.tsu <= 1) AS tracks,
    list_transform(
      list_filter(tracks2, t -> t.tsu < 1 AND (t.hs >= 3 OR fc <= 3)),
      t -> struct_pack(tid := t.id + 1, b1 := ${bb("t.x", 0)},
        b2 := ${bb("t.x", 1)}, b3 := ${bb("t.x", 2)}, b4 := ${bb("t.x", 3)})) AS em,
    poison1 AS poison
  FROM (
   SELECT *, list_concat(tr2, newts) AS tracks2
   FROM (
    SELECT *,
      list_transform(range(1, nt + 1), ti -> CASE WHEN md[ti] > 0
        THEN struct_pack(
          id := (trv[ti]).id, tsu := CAST(0 AS BIGINT), hs := (trv[ti]).hs + 1,
          x := (list_filter(ux, e -> e.ti = ti)[1]).x,
          p := (list_filter(ux, e -> e.ti = ti)[1]).p)
        ELSE trv[ti] END) AS tr2,
      list_transform(range(1, len(ud) + 1), kk -> struct_pack(
        id := next_id + (kk - 1), tsu := CAST(0 AS BIGINT), hs := CAST(0 AS BIGINT),
        x := [(zd[ud[kk]])[1], (zd[ud[kk]])[2], (zd[ud[kk]])[3], (zd[ud[kk]])[4],
              0.0, 0.0, 0.0],
        p := $p0)) AS newts
    FROM (
     WITH base AS MATERIALIZED (
      SELECT * FROM (
          SELECT *,
             list_transform(range(1, nt + 1), ti ->
               coalesce((list_filter(matches, mp -> mp.t = ti)[1]).d, 0)) AS md,
             list_filter(range(1, nd + 1), dj ->
               len(list_filter(matches, mp -> mp.d = dj)) = 0) AS ud,
             list_transform(dl, dd -> ${detZ("dd")}) AS zd
           FROM (
            SELECT *,
              list_filter(cand, mp -> (iouM[mp.d])[mp.t] >= 0.3) AS matches,
              (poison OR nd > 3) AS poison1
            FROM (
             SELECT *, CASE
                 WHEN nd = 0 OR nt = 0 THEN CAST([] AS $PAIR[])
                 WHEN greedy_ok THEN flatten(list_transform(range(1, nd + 1), di ->
                   list_transform(list_filter(range(1, nt + 1), tj ->
                     (iouM[di])[tj] > 0.3), tj -> struct_pack(d := di, t := tj))))
                 ELSE flatten(list_transform(range(1, nd + 1), di ->
                   CASE WHEN best[di] > 0
                        THEN [struct_pack(d := di, t := best[di])]
                        ELSE CAST([] AS $PAIR[]) END))
               END AS cand
             FROM (
              SELECT *, CASE WHEN nd > 0 AND nt > 0 AND NOT greedy_ok THEN
                  ((list_sort(list_transform(list_filter($asgs,
                      $validAsg),
                    a -> struct_pack(ns := -($asgScore), a := a))))[1]).a
                ELSE NULL END AS best
              FROM (
               SELECT *,
                 (coalesce(list_max(list_transform(iouM, r ->
                    len(list_filter(r, v -> v > 0.3)))), 0) <= 1
                  AND coalesce(list_max(list_transform(range(1, nt + 1), tj ->
                    len(list_filter(iouM, r -> r[tj] > 0.3)))), 0) <= 1) AS greedy_ok
               FROM (
                SELECT *, list_transform(dl, dd ->
                  list_transform(trv, tv -> ${iou("dd", "tv.x")})) AS iouM
                FROM (
                 SELECT *, len(trv) AS nt, len(dl) AS nd
                 FROM (
                  SELECT *, list_filter(tr1, t -> NOT ($nanBox)) AS trv
                  FROM (
                   SELECT *, list_transform(tr0, t -> struct_pack(
                     id := t.id, tsu := t.tsu + 1,
                     hs := CASE WHEN t.tsu > 0 THEN 0 ELSE t.hs END,
                     x := ${predX("t")},
                     p := ${predP("t")})) AS tr1
                   FROM (
                    SELECT stream_id, f0, f1, fr, fr - f0 + 1 AS fc,
                      next_id, tr0,
                      CASE WHEN dfr = fr THEN ddl
                           ELSE CAST([] AS $DETS[]) END AS dl, poison
                    FROM (
                     SELECT s.stream_id, s.f0, s.f1, s.next_id,
                       s.tracks AS tr0, s.poison, d.frame AS dfr, d.dl AS ddl,
                       CAST(CASE WHEN len(s.tracks) = 0 THEN k.nxt
                                 ELSE s.frame + 1 END AS BIGINT) AS fr
                     FROM step s
                     LEFT JOIN skips k
                       ON k.stream_id = s.stream_id AND k.frame = s.frame
                     LEFT JOIN fdets d
                       ON d.stream_id = s.stream_id
                       AND d.frame = CASE WHEN len(s.tracks) = 0 THEN k.nxt
                                          ELSE s.frame + 1 END
                     WHERE s.frame < s.f1
                    ) x
                   ) x
                  ) x
                 ) x
                ) x
               ) x
              ) x
             ) x
            ) x
           ) x
          ) x
     ),
     upd AS (
      SELECT stream_id,
        list(struct_pack(ti := ti, x := x2, p := p2) ORDER BY ti) AS ux
      FROM (
       SELECT *, $p2List AS p2
       FROM (
        SELECT *, $x2List AS x2, $mList AS mv
        FROM (
         SELECT *, $kList AS kv
         FROM (
          SELECT *, $sinvList AS si
          FROM (
           SELECT *, ${det4("s16")} AS dt
           FROM (
            SELECT *, $yList AS y4, $ssList AS s16
            FROM (
             SELECT b.stream_id, u.ti, (u.t).x AS px, (u.t).p AS pp,
               (b.zd)[u.mdi] AS z4
             FROM base b, LATERAL (SELECT unnest(b.trv) AS t,
               unnest(range(1, len(b.trv) + 1)) AS ti, unnest(b.md) AS mdi) u
             WHERE u.mdi > 0
            ) x
           ) x
          ) x
         ) x
        ) x
       ) x
      ) x
      GROUP BY stream_id
     )
     SELECT b.*, coalesce(w.ux,
       CAST([] AS STRUCT(ti BIGINT, x DOUBLE[], p DOUBLE[])[])) AS ux
     FROM base b LEFT JOIN upd w USING (stream_id)
    ) x
   ) x
  ) x
)
$finalSelect"""
  }

  /** n01/n15 detections (mirror of ControlQueries.sortDetections). */
  private val n01Dets =
    """dets AS MATERIALIZED (
      |  SELECT stream_id, frame, x1, y1, x1 + 60.0 AS x2, y1 + 80.0 AS y2
      |  FROM (
      |    SELECT stream_id, frame,
      |      50.0 + frame * 2.0 + obj * 300.0 + (eid % 5) * 0.5 AS x1,
      |      100.0 + frame * 1.5 + obj * 50.0 AS y1
      |    FROM (
      |      SELECT user_id % ns AS stream_id, event_id % 150 AS frame,
      |        user_id % 3 AS obj, min(event_id) AS eid
      |      FROM events, (SELECT greatest(count(*) // 625, 1) AS ns FROM events) nrm
      |      GROUP BY 1, 2, 3))
      |)""".stripMargin

  private val n01Final =
    """SELECT stream_id, frame, CAST(e.tid AS INTEGER) AS track_id,
      |  round(e.b1, 2) AS x1, round(e.b2, 2) AS y1,
      |  round(e.b3, 2) AS x2, round(e.b4, 2) AS y2
      |FROM (SELECT stream_id, frame, unnest(em) AS e FROM step WHERE NOT poison) u
      |ORDER BY stream_id, frame, track_id""".stripMargin

  /** Full n01/n15 replay SQL (DuckDB), over the `events` view. */
  lazy val sql: String = engine(n01Dets, n01Final)

  /** m05/n23 detections: the composite V-ETL front half — LCG payload
    * synthesis (the m01 technique: 64-bit LCG in HUGEINT mod-2^64
    * arithmetic, byte = state >>> 56), far-future sentinel copies of
    * stream 0's first 10 frames (VetlPipeline.withSentinels), and the
    * luma-modulated stub detector (VetlPipeline.detectStub: two boxes
    * per frame, score = 0.5 + (byteSum/60)/512 — exact, the byte sum is
    * an integer). `scores` mirrors the per-frame avg over the two equal
    * det scores (avg of two identical doubles is exact).
    */
  private val m05Dets =
    """seeds AS (
      |  SELECT (user_id % 4) AS stream_id, (event_id % 600) AS frame,
      |    min(event_id) AS seed
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
      |lumas AS MATERIALIZED (
      |  SELECT stream_id, frame, CAST(sum(s // 72057594037927936) AS BIGINT) AS luma60
      |  FROM lcg GROUP BY 1, 2),
      |allf AS (
      |  SELECT * FROM lumas
      |  UNION ALL
      |  SELECT stream_id, frame + 30000, luma60 FROM lumas
      |  WHERE stream_id = 0 AND frame < 10),
      |sdets AS MATERIALIZED (
      |  SELECT stream_id, frame,
      |    80.0 + 2.0 * frame + 400.0 * obj + 15.0 * stream_id AS x1,
      |    60.0 + 1.5 * frame + 120.0 * obj AS y1,
      |    0.5 + (luma60 / 60.0) / 512.0 AS score
      |  FROM allf, unnest([0, 1]) AS o(obj)),
      |dets AS MATERIALIZED (
      |  SELECT stream_id, frame, x1, y1, x1 + 70.0 AS x2, y1 + 90.0 AS y2
      |  FROM sdets),
      |scores AS (
      |  SELECT stream_id, frame, min(score) AS score
      |  FROM sdets GROUP BY 1, 2)""".stripMargin

  /** m05/n23 windowed quality over the replayed tracks (mirror of
    * VetlPipeline.qualityGateWindows): 2 s tumbling event-time windows
    * from the 30 fps frame clock, integer-exact quantized score sum,
    * windows at/after the sentinel cutoff dropped. n_tracks uses exact
    * COUNT(DISTINCT) against Spark's approx_count_distinct — at these
    * cardinalities (<= tracks-per-stream-window, single digits) the
    * HLL++ linear-counting estimate equals the exact count unless two
    * track ids collide in a 2^14-register sketch; a collision would fail
    * the gate loudly, which is the point of an oracle.
    */
  private val m05Final =
    """SELECT CAST(epoch_ms(win_ms) AS VARCHAR) AS chunk_start, stream_id,
      |  count(DISTINCT track_id) AS n_tracks, count(*) AS n_boxes,
      |  CAST(sum(CAST(floor(score * 1e6) AS BIGINT)) AS BIGINT) // count(*) AS score_micro
      |FROM (
      |  SELECT t.stream_id, t.frame, t.track_id, sc.score,
      |    (1704067200000 + t.frame * 33) - ((1704067200000 + t.frame * 33) % 2000) AS win_ms
      |  FROM (
      |    SELECT stream_id, frame, CAST((e).tid AS INTEGER) AS track_id
      |    FROM (SELECT stream_id, frame, unnest(em) AS e FROM step WHERE NOT poison) u
      |  ) t JOIN scores sc ON sc.stream_id = t.stream_id AND sc.frame = t.frame
      |) w
      |WHERE win_ms < 1704067800000
      |GROUP BY win_ms, stream_id
      |ORDER BY stream_id, chunk_start""".stripMargin

  /** Full m05/n23 replay SQL: synthesize → detect → track → window,
    * all recomputed live by DuckDB from the events table.
    */
  lazy val m05Sql: String = engine(m05Dets, m05Final)

  /** Dev tool: print the generated SQL (`--m05` for the composite). */
  def main(args: Array[String]): Unit =
    println(if (args.contains("--m05")) m05Sql else sql)
}
