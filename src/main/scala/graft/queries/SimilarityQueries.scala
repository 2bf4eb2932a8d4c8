package graft.queries

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search catalog over the `embeddings` table
  * (`vec_id BIGINT, embedding ARRAY<FLOAT>, label INT`).
  *
  * Oracle-checked queries use integer-quantized vectors (floor(x*1000)) so
  * dot products are exact and the one final double division/sqrt is
  * IEEE-bit-identical in Spark and DuckDB — thresholds and top-k ranks
  * then compare exactly. Float-math variants are rows-only + spec-tested.
  */
object SimilarityQueries {

  private[queries] val quantDuck =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
  private[queries] val cosDuck =
    """CAST(list_sum(list_transform(generate_series(1, 64), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      |    / (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS DOUBLE))
      |       * sqrt(CAST(list_sum(list_transform(b.qv, x -> x*x)) AS DOUBLE)))""".stripMargin

  /** The MMR greedy-selection replay both e15 (brute candidates) and
    * e16 (IVF full-probe candidates — identical by the e14 property)
    * are gated against: candidates, pairwise sims and the recursive
    * argmax selection all recomputed live from the raw embeddings.
    */
  private lazy val mmrGreedyOracle: String = s"""WITH RECURSIVE
              |q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
              |scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosDuck AS cos
              |  FROM q a JOIN q b ON a.vec_id < 50 AND a.vec_id <> b.vec_id),
              |cand AS (
              |  SELECT query_id, neighbor_id, CAST(floor(cos * 1e6) AS BIGINT) AS rel
              |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |                    ORDER BY cos DESC, neighbor_id ASC) AS rn FROM scored)
              |  WHERE rn <= 20),
              |pair AS (
              |  -- NOT materialized: correlated refs into a MATERIALIZED CTE
              |  -- from a recursive arm silently decorrelate to NULL in DuckDB
              |  SELECT c1.query_id, c1.neighbor_id AS a_id, c2.neighbor_id AS b_id,
              |    CAST(floor((CAST(list_sum(list_transform(generate_series(1, 64),
              |                       i -> qa.qv[i] * qb.qv[i])) AS DOUBLE)
              |        / (sqrt(CAST(list_sum(list_transform(qa.qv, x -> x*x)) AS DOUBLE))
              |           * sqrt(CAST(list_sum(list_transform(qb.qv, x -> x*x)) AS DOUBLE))))
              |      * 1e6) AS BIGINT) AS sim
              |  FROM cand c1
              |  JOIN cand c2 ON c1.query_id = c2.query_id AND c1.neighbor_id <> c2.neighbor_id
              |  JOIN q qa ON qa.vec_id = c1.neighbor_id
              |  JOIN q qb ON qb.vec_id = c2.neighbor_id),
              |sel AS (
              |  SELECT 1 AS pick, query_id, neighbor_id, [neighbor_id] AS chosen, 7 * rel AS mmr
              |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              |                    ORDER BY rel DESC, neighbor_id ASC) AS rn FROM cand)
              |  WHERE rn = 1
              |  UNION ALL
              |  SELECT z.pick + 1, z.query_id, z.nxt, list_append(z.chosen, z.nxt), z.nsc
              |  FROM (
              |    SELECT s.pick, s.query_id, s.chosen,
              |      (SELECT c.neighbor_id FROM cand c
              |       WHERE c.query_id = s.query_id AND NOT list_contains(s.chosen, c.neighbor_id)
              |       ORDER BY 7 * c.rel - 3 * (SELECT max(p.sim) FROM pair p
              |                  WHERE p.query_id = s.query_id AND p.a_id = c.neighbor_id
              |                    AND list_contains(s.chosen, p.b_id)) DESC, c.neighbor_id ASC
              |       LIMIT 1) AS nxt,
              |      (SELECT 7 * c.rel - 3 * (SELECT max(p.sim) FROM pair p
              |                  WHERE p.query_id = s.query_id AND p.a_id = c.neighbor_id
              |                    AND list_contains(s.chosen, p.b_id)) FROM cand c
              |       WHERE c.query_id = s.query_id AND NOT list_contains(s.chosen, c.neighbor_id)
              |       ORDER BY 7 * c.rel - 3 * (SELECT max(p.sim) FROM pair p
              |                  WHERE p.query_id = s.query_id AND p.a_id = c.neighbor_id
              |                    AND list_contains(s.chosen, p.b_id)) DESC, c.neighbor_id ASC
              |       LIMIT 1) AS nsc
              |    FROM sel s WHERE s.pick < 5
              |  ) z
              |  WHERE z.nxt IS NOT NULL)
              |SELECT query_id, CAST(pick AS BIGINT) AS pick, neighbor_id, mmr AS mmr_micro
              |FROM sel ORDER BY query_id, pick""".stripMargin

  /** Shared full-replay CTE prefix for the IVF-family oracles (e06/e09/
    * e19): DuckDB recomputes, from the raw parquet floats with NO frozen
    * constants, everything up to the per-query probed cells —
    * (1) the xxhash64 sample order (TextQueries' byte-exact XXH64 CTE,
    *     signed-long comparison matching Spark's orderBy),
    * (2) the 10-iteration coarse Lloyd fit as a recursive CTE: init =
    *     first k distinct sample points, strict-< argmin with ties to
    *     the lowest index, per-cell means summed IN SAMPLE ORDER
    *     (list(ev ORDER BY pos) → left-to-right list_sum = the driver
    *     fit's sequential double accumulation), empty cells keep their
    *     previous center, k replaying autoNlist's floor(√n + 0.5),
    * (3) full-corpus nearest-cell assignment (asg) — for e12 this IS
    *     the append path: appendToIvf assigns late rows with the same
    *     argmin kernel against the frozen centers, so build-on-subset +
    *     append == one-pass assignment of everything (the property
    *     SimilaritySpec asserts),
    * (4) the vec_id % 20 query slice and its nprobe=4 probed cells by
    *     (dist, cell) order (probes).
    * `trainWhere` restricts the CENTROID TRAINING relation (e12 trains
    * on the ~75% md5 split); assignment and probing always run over the
    * full corpus. Each oracle appends its own ranking tail. Every stage
    * was verified bit-identical against the engine's own intermediates
    * before landing.
    */
  /** keys → xxh64 → signed hash order → corp(vec_id, ev, pos): the
    * corpus in Spark's deterministic sample order — the root CTE block
    * every full-replay oracle builds on (also standalone: e08's raw
    * sample).
    *
    * Replay bounds (the oracle fails LOUDLY outside them, never wrongly
    * passes): (a) the init CTE replays Similarity.lloyd's init as "first
    * k DISTINCT sample points" only — lloyd additionally stride-fills
    * duplicate seeds when the 10k-sample has fewer than k distinct
    * points, a duplicate-density regime the embeddings tables never
    * enter (distinct sample >> k at every SF); (b) the replay assumes
    * enforceMaxCell never splits a cell, true below ~defaultMaxCell²
    * (≈16.7M) vectors per cell. A corpus violating either bound shows
    * up as a hash mismatch, at which point the init CTE needs the
    * stride-fill arm / a split-aware assignment replay.
    */
  private lazy val corpReplayCtes: String =
    s"""keys AS (SELECT vec_id::HUGEINT AS v FROM embeddings),
       |${TextQueries.xxh64LongDuck},
       |sgn AS (SELECT v, CASE WHEN hu >= 9223372036854775808::HUGEINT
       |                       THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS hs FROM hsh),
       |corp AS (SELECT e.vec_id::BIGINT AS vec_id,
       |           list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev,
       |           row_number() OVER (ORDER BY s.hs, e.vec_id) AS pos
       |         FROM embeddings e JOIN sgn s ON s.v = e.vec_id::HUGEINT)""".stripMargin

  /** The 10-iteration coarse Lloyd fit → cfin(cents) — the shared
    * trainer replay behind buildIvfIndex AND semDedup (both fit the
    * identical xxhash64-sampled 10-iteration Lloyd). `trainWhere`
    * restricts the training relation (e12's md5 split); `kSql` (over
    * `n` = training-relation row count) overrides the autoNlist law
    * (e05 fixes k=10).
    */
  private def lloydReplayCtes(trainWhere: String = "TRUE",
      kSql: String =
        "greatest(4, least(4096, CAST(floor(sqrt(n::DOUBLE) + 0.5) AS INT)))")
      : String =
    s"""trn AS (SELECT ev, row_number() OVER (ORDER BY pos) AS tpos
       |        FROM corp WHERE $trainWhere),
       |par AS (SELECT $kSql AS k
       |        FROM (SELECT count(*) AS n FROM trn)),
       |smp AS (SELECT tpos AS pos, ev FROM trn WHERE tpos <= 10000),
       |init AS (SELECT pos, ev FROM smp s
       |         WHERE NOT EXISTS (SELECT 1 FROM smp s2 WHERE s2.pos < s.pos AND s2.ev = s.ev)
       |         ORDER BY pos LIMIT (SELECT k FROM par)),
       |ll(step, cents) AS (
       |  SELECT 0, (SELECT list(ev ORDER BY pos) FROM init)
       |  UNION ALL
       |  SELECT g2.step + 1,
       |    list_transform(range(len(g2.cents)), c ->
       |      CASE WHEN list_contains(g2.bests, c) THEN g2.means[list_position(g2.bests, c)]
       |           ELSE g2.cents[c + 1] END)
       |  FROM (
       |    SELECT g.step, first(g.cents) AS cents,
       |           list(g.best ORDER BY g.best) AS bests,
       |           list(g.m ORDER BY g.best) AS means
       |    FROM (
       |      SELECT gi.step, gi.cents, gi.best,
       |        list_transform(range(64), i ->
       |          list_sum(list_transform(gi.pts, p -> p[i + 1])) / gi.cnt) AS m
       |      FROM (
       |        SELECT x2.step, first(x2.cents) AS cents, x2.best, count(*) AS cnt,
       |          list(x2.ev ORDER BY x2.pos) AS pts
       |        FROM (
       |          SELECT x1.*, CAST(list_position(x1.dl, list_min(x1.dl)) - 1 AS BIGINT) AS best
       |          FROM (
       |            SELECT l.step, l.cents, s.pos, s.ev,
       |              list_transform(range(len(l.cents)), c ->
       |                list_sum(list_transform(range(64), i ->
       |                  (s.ev[i + 1] - l.cents[c + 1][i + 1])
       |                  * (s.ev[i + 1] - l.cents[c + 1][i + 1])))) AS dl
       |            FROM ll l, smp s
       |            WHERE l.step < 10
       |          ) x1
       |        ) x2
       |        GROUP BY x2.step, x2.best
       |      ) gi
       |    ) g
       |    GROUP BY g.step
       |  ) g2),
       |cfin AS (SELECT cents FROM ll WHERE step = 10)""".stripMargin

  private def ivfReplayPrefix(trainWhere: String = "TRUE"): String =
    s"""WITH RECURSIVE
       |$corpReplayCtes,
       |${lloydReplayCtes(trainWhere)},
       |asg AS (
       |  SELECT c.vec_id, c.ev, c.pos,
       |    CAST(list_position(dl, list_min(dl)) - 1 AS INT) AS cell
       |  FROM (
       |    SELECT corp.*,
       |      list_transform(range(len(f.cents)), cc ->
       |        list_sum(list_transform(range(64), i ->
       |          (ev[i + 1] - f.cents[cc + 1][i + 1])
       |          * (ev[i + 1] - f.cents[cc + 1][i + 1])))) AS dl
       |    FROM corp CROSS JOIN cfin f
       |  ) c),
       |qs AS (
       |  SELECT vec_id AS query_id, ev AS qv FROM corp WHERE vec_id % 20 = 0),
       |qdl AS (
       |  SELECT q.query_id, q.qv,
       |    list_transform(range(len(f.cents)), cc ->
       |      list_sum(list_transform(range(64), i ->
       |        (q.qv[i + 1] - f.cents[cc + 1][i + 1])
       |        * (q.qv[i + 1] - f.cents[cc + 1][i + 1])))) AS dl
       |  FROM qs q CROSS JOIN cfin f),
       |probes AS (
       |  SELECT query_id, qv, CAST(cell AS INT) AS cell
       |  FROM (
       |    SELECT query_id, qv, cell,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d ASC, cell ASC) AS rn
       |    FROM (
       |      SELECT query_id, qv,
       |        unnest(range(0, len(dl))) AS cell, unnest(dl) AS d
       |      FROM qdl)
       |  ) WHERE rn <= 4)""".stripMargin

  /** The 8 per-subspace 15-iteration PQ Lloyd fits as ONE recursive CTE
    * (subspace j as a grouping column) + the encode distance lists —
    * shared by e09 (rsmp = raw vectors) and e19 (rsmp = residuals to
    * the assigned coarse centroid). References a caller-provided
    * `rsmp(pos, r)` CTE; ends with `books(b)`.
    */
  private lazy val subspaceLloydCtes: String =
    s"""binit AS (
       |  SELECT j.j, pos,
       |    s.r[CAST(j.j * 8 + 1 AS INT):CAST(j.j * 8 + 8 AS INT)] AS sv
       |  FROM rsmp s, range(0, 8) AS j(j)
       |  WHERE NOT EXISTS (SELECT 1 FROM rsmp s2
       |    WHERE s2.pos < s.pos
       |      AND s2.r[CAST(j.j * 8 + 1 AS INT):CAST(j.j * 8 + 8 AS INT)]
       |          = s.r[CAST(j.j * 8 + 1 AS INT):CAST(j.j * 8 + 8 AS INT)])),
       |binit16 AS (
       |  SELECT j, list(sv ORDER BY pos) AS svs
       |  FROM (SELECT j, pos, sv,
       |          row_number() OVER (PARTITION BY j ORDER BY pos) AS rn
       |        FROM binit) WHERE rn <= 16 GROUP BY j),
       |bl(step, j, cents) AS (
       |  SELECT 0, j, svs FROM binit16
       |  UNION ALL
       |  SELECT g2.step + 1, g2.j,
       |    list_transform(range(len(g2.cents)), c ->
       |      CASE WHEN list_contains(g2.bests, c) THEN g2.means[list_position(g2.bests, c)]
       |           ELSE g2.cents[c + 1] END)
       |  FROM (
       |    SELECT g.step, g.j, first(g.cents) AS cents,
       |           list(g.best ORDER BY g.best) AS bests,
       |           list(g.m ORDER BY g.best) AS means
       |    FROM (
       |      SELECT gi.step, gi.j, gi.cents, gi.best,
       |        list_transform(range(8), i ->
       |          list_sum(list_transform(gi.pts, p -> p[i + 1])) / gi.cnt) AS m
       |      FROM (
       |        SELECT x2.step, x2.j, first(x2.cents) AS cents, x2.best, count(*) AS cnt,
       |          list(x2.sv ORDER BY x2.pos) AS pts
       |        FROM (
       |          SELECT x1.*, CAST(list_position(x1.dl, list_min(x1.dl)) - 1 AS BIGINT) AS best
       |          FROM (
       |            SELECT l.step, l.j, l.cents, s.pos,
       |              s.r[CAST(l.j * 8 + 1 AS INT):CAST(l.j * 8 + 8 AS INT)] AS sv,
       |              list_transform(range(len(l.cents)), c ->
       |                list_sum(list_transform(range(8), i ->
       |                  (s.r[CAST(l.j * 8 + i + 1 AS INT)] - l.cents[c + 1][i + 1])
       |                  * (s.r[CAST(l.j * 8 + i + 1 AS INT)] - l.cents[c + 1][i + 1])))) AS dl
       |            FROM bl l, rsmp s
       |            WHERE l.step < 15
       |          ) x1
       |        ) x2
       |        GROUP BY x2.step, x2.j, x2.best
       |      ) gi
       |    ) g
       |    GROUP BY g.step, g.j
       |  ) g2),
       |books AS (SELECT list(cents ORDER BY j) AS b FROM bl WHERE step = 15)""".stripMargin

  /** ADC top-32 → exact cosine re-rank → ranked top-5, shared by the
    * two PQ oracles. References caller CTEs `adcs(query_id, qv,
    * neighbor_id, adc)` and the prefix's `corp`.
    */
  private lazy val pqRerankTail: String =
    """cand AS (
      |  SELECT query_id, qv, neighbor_id
      |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |          ORDER BY adc ASC, neighbor_id ASC) AS rn FROM adcs)
      |  WHERE rn <= 32),
      |rer AS (
      |  SELECT c.query_id, c.neighbor_id,
      |    list_sum(list_transform(range(64), i -> c.qv[i + 1] * v.ev[i + 1]))
      |    / (sqrt(list_sum(list_transform(range(64), i -> c.qv[i + 1] * c.qv[i + 1])))
      |       * sqrt(list_sum(list_transform(range(64), i -> v.ev[i + 1] * v.ev[i + 1])))) AS cos
      |  FROM cand c JOIN corp v ON v.vec_id = c.neighbor_id)
      |SELECT query_id, neighbor_id,
      |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank,
      |  round(cos, 6) AS cos
      |FROM rer
      |QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Exact-cosine ranking of the prefix's probed cells (three
    * independent left-to-right accumulators matching CosineSim), top-5
    * by (cos desc, id) — probeIvf's ranking replayed; shared by e06
    * (full-corpus index) and e12 (subset-trained, append path).
    */
  private lazy val cosRankTail: String =
    """rer AS (
      |  SELECT p.query_id, v.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(64), i -> p.qv[i + 1] * v.ev[i + 1]))
      |    / (sqrt(list_sum(list_transform(range(64), i -> p.qv[i + 1] * p.qv[i + 1])))
      |       * sqrt(list_sum(list_transform(range(64), i -> v.ev[i + 1] * v.ev[i + 1])))) AS cos
      |  FROM probes p JOIN asg v ON v.cell = p.cell AND v.vec_id <> p.query_id)
      |SELECT query_id, neighbor_id,
      |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank,
      |  round(cos, 6) AS cos
      |FROM rer
      |QUALIFY rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** e06's full-replay oracle: probeIvf replayed end to end, ranked
    * rows hash-matched. */
  private lazy val e06ReplayOracle: String =
    s"""${ivfReplayPrefix()},
       |$cosRankTail""".stripMargin

  /** e12's full-replay oracle: centroids trained ONLY on the ~75% md5
    * split (DuckDB's md5 replays Spark's byte-for-byte on the same
    * 'iv#'||vec_id string), every vector — late arrivals included —
    * assigned and probed against those frozen centers: exactly
    * build-on-subset + appendToIvf + probeIvf, ranked rows
    * hash-matched. A vector lost or mis-assigned by the append flips
    * rows directly.
    */
  private lazy val e12ReplayOracle: String =
    s"""${ivfReplayPrefix(
           "substr(md5('iv#' || vec_id::VARCHAR), 1, 1) >= '4'")},
       |$cosRankTail""".stripMargin

  /** e09's full-replay oracle: raw-vector PQ — subspace Lloyd fits over
    * the raw xxhash64-ordered sample, per-vector encode, ADC with the
    * 64 raw-difference terms summed flat in the kernel's j-outer/
    * i-inner order, top-32, exact re-rank. probeIvfPq replayed end to
    * end, ranked rows hash-matched.
    */
  private lazy val e09ReplayOracle: String =
    s"""${ivfReplayPrefix()},
       |rsmp AS (SELECT pos, ev AS r FROM corp WHERE pos <= 2000),
       |$subspaceLloydCtes,
       |codd AS (
       |  SELECT a.vec_id, a.cell,
       |    list_transform(range(8), j ->
       |      list_transform(range(16), c ->
       |        list_sum(list_transform(range(8), i ->
       |          (a.ev[CAST(j * 8 + i + 1 AS INT)] - bb.b[j + 1][c + 1][i + 1])
       |          * (a.ev[CAST(j * 8 + i + 1 AS INT)] - bb.b[j + 1][c + 1][i + 1]))))) AS dls
       |  FROM asg a CROSS JOIN books bb),
       |cod AS (
       |  SELECT vec_id, cell,
       |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS codes
       |  FROM codd),
       |adcs AS (
       |  SELECT p.query_id, p.qv, d.vec_id AS neighbor_id,
       |    list_sum(list_transform(
       |      list_transform(range(64), i ->
       |        p.qv[i + 1]
       |        - bb.b[i // 8 + 1][d.codes[CAST(i // 8 + 1 AS INT)] + 1][i % 8 + 1]),
       |      t -> t * t)) AS adc
       |  FROM probes p CROSS JOIN books bb
       |  JOIN cod d ON d.cell = p.cell AND d.vec_id <> p.query_id),
       |$pqRerankTail""".stripMargin

  /** e19's full-replay oracle: the residual sibling — codebooks fit on
    * residuals to the assigned coarse centroid, encode over residuals,
    * ADC against the candidate cell's query residual. See the e19
    * entry comment for the full stage map.
    */
  private lazy val e19ReplayOracle: String =
    s"""${ivfReplayPrefix()},
       |res AS (
       |  SELECT a.vec_id, a.pos, a.cell,
       |    list_transform(range(64), i ->
       |      a.ev[i + 1] - f.cents[a.cell + 1][i + 1]) AS r
       |  FROM asg a CROSS JOIN cfin f),
       |rsmp AS (SELECT pos, r FROM res WHERE pos <= 2000),
       |$subspaceLloydCtes,
       |codd AS (
       |  SELECT res.vec_id, res.cell,
       |    list_transform(range(8), j ->
       |      list_transform(range(16), c ->
       |        list_sum(list_transform(range(8), i ->
       |          (r[CAST(j * 8 + i + 1 AS INT)] - bb.b[j + 1][c + 1][i + 1])
       |          * (r[CAST(j * 8 + i + 1 AS INT)] - bb.b[j + 1][c + 1][i + 1]))))) AS dls
       |  FROM res CROSS JOIN books bb),
       |cod AS (
       |  SELECT vec_id, cell,
       |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS codes
       |  FROM codd),
       |adcs AS (
       |  SELECT p.query_id, p.qv, d.vec_id AS neighbor_id,
       |    list_sum(list_transform(
       |      list_transform(range(64), i ->
       |        (p.qv[i + 1] - f.cents[p.cell + 1][i + 1])
       |        - bb.b[i // 8 + 1][d.codes[CAST(i // 8 + 1 AS INT)] + 1][i % 8 + 1]),
       |      t -> t * t)) AS adc
       |  FROM probes p CROSS JOIN cfin f CROSS JOIN books bb
       |  JOIN cod d ON d.cell = p.cell AND d.vec_id <> p.query_id),
       |$pqRerankTail""".stripMargin

  val all: Seq[Q] = Seq(

    // Threshold similarity self-join: 50 query vectors vs the corpus.
    // Query side broadcast → corpus never shuffles.
    Q("e01_cosine_threshold",
      (s, d) => Similarity
        .cosineThreshold(Tables.embeddings(s, d), col("vec_id") < 50, 0.2)
        .select(col("va"), col("vb"), round(col("cos"), 6).as("cos"))
        .orderBy("va", "vb"),
      Some(s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings)
              |SELECT a.vec_id AS va, b.vec_id AS vb, round($cosDuck, 6) AS cos
              |FROM q a JOIN q b ON a.vec_id < 50 AND a.vec_id <> b.vec_id
              |WHERE $cosDuck >= 0.2
              |ORDER BY va, vb""".stripMargin)),

    // Embedding near-dup CLUSTERS: the e01 threshold pairs collapsed to
    // connected components (min-id label) — the "keep one per duplicate
    // group" step of an embedding-dedup pipeline, composing the cosine
    // kernel with the star-contraction clusterer. bench=false: both
    // halves are benched individually (e01, d04).
    Q("d07_embedding_dup_clusters",
      (s, d) => graft.operators.Dedup.dupClusters(
          Similarity.cosineThreshold(Tables.embeddings(s, d), col("vec_id") < 50, 0.2)
            .select(col("va").as("doc_a"), col("vb").as("doc_b")))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
              |pairs AS (
              |  SELECT a.vec_id AS va, b.vec_id AS vb
              |  FROM q a JOIN q b ON a.vec_id < 50 AND a.vec_id <> b.vec_id
              |  WHERE $cosDuck >= 0.2),
              |edges AS (
              |  SELECT va AS s, vb AS d FROM pairs
              |  UNION SELECT vb, va FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT s, s FROM edges
              |  UNION
              |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s)
              |SELECT id AS doc_id, min(r) AS cluster_id
              |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin),
      ),

    // Exact top-5 neighbors per query (brute-force baseline for ANN).
    Q("e02_knn_topk",
      (s, d) => Similarity
        .quantizedKnn(Tables.embeddings(s, d), col("vec_id") < 100, 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rank"),
      Some(s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
              |scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosDuck AS cos
              |  FROM q a JOIN q b ON a.vec_id < 100 AND a.vec_id <> b.vec_id),
              |ranked AS (
              |  SELECT query_id, neighbor_id, cos,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM scored)
              |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
              |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // Sign-bit LSH bucket histogram (the IVF/LSH scale path's partitioner).
    Q("e03_lsh_buckets",
      (s, d) => Tables.embeddings(s, d)
        .select(signBucket(col("embedding"), Seq(1, 9, 17, 25, 33, 41, 49, 57)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT bucket, count(*) AS n FROM (
             | SELECT concat(
             |   CASE WHEN embedding[1]  >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[9]  >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[25] >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[41] >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END,
             |   CASE WHEN embedding[57] >= 0 THEN '1' ELSE '0' END) AS bucket
             | FROM embeddings) t
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // LSH-bucketed ANN, LIVE oracle (round 7; was a frozen sf0.01 golden):
    // over integer-quantized vectors the whole pipeline (sign-bit bucket
    // key, size aggregation, salt column, per-bucket exact ranking,
    // rank/tie-break) is a pure integer function DuckDB reproduces
    // end-to-end. Since round 12 the BIT COUNT is derived from the corpus
    // size (Similarity.autoLshBits over the lshDimLadder prefix — the
    // occupancy law that removes the fixed-2^8 density knee), and the
    // oracle replays the law in the same integer arithmetic: bits =
    // clamp(bitlength(ceil(n/64)-1), 8, 24), bucket = the first `bits`
    // chars of the 24-dim ladder signature. ≤16384 vectors → 8 bits, the
    // historical bucket, byte-identical to rounds ≤11 at the oracle SFs
    // (sf0.01/sf0.1); the law engages at sf1 (20k → 9 bits) and sf10
    // (200k → 12 bits) and the oracle replays it live there.
    // The oracle omits the hot-bucket salt because under the law expected
    // occupancy is ~64 << maxBucket=4096 (salt stays 0, byte-equal to
    // the unguarded path by construction — Similarity.lshKnn doc). The
    // float-cosine variant of the same kernel stays recall-asserted vs
    // brute force in OperatorSpecs.
    Q("e04_lsh_knn",
      (s, d) => Similarity.lshKnn(
          Tables.embeddings(s, d)
            .select(col("vec_id"), quantize(col("embedding")).as("embedding")), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rank"),
      Some {
        val bucketSql = Similarity.lshDimLadder(64).take(24)
          .map(i => s"(CASE WHEN qv[$i] >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")
        s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
           |p AS (SELECT greatest(8, least(24,
           |       length(bin(greatest(((count(*) + 63) // 64) - 1, 1))))) AS bits
           |     FROM q),
           |bk AS (SELECT vec_id, qv,
           |         substr($bucketSql, 1, (SELECT bits FROM p)) AS bucket
           |       FROM q),
           |scored AS (
           |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosDuck AS cos
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
           |ranked AS (
           |  SELECT query_id, neighbor_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
           |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // Multi-table LSH ANN (the L-table OR-construction — the standard
    // recall lever over e04's single table; table 0's coordinate slice
    // IS e04-auto's prefix at every scale, so candidates are a superset
    // and recall@k is monotonically ≥ e04's, spec-pinned). PER-TABLE
    // bits follow the same occupancy law as e04 and the TABLE COUNT
    // yields to it (tables = min(4, ladder_len // bits)) — the recall
    // dial trades tables, never occupancy; a fixed-4x8 form re-entered
    // the occupancy knee at 258.6 s at sf10 (SCALING.md). The oracle
    // replays the law, every table's bucket family (substr slices of
    // one full-ladder signature — 64 chars at 64 dims since the r13
    // ladder deepening, which keeps 4 tables live at sf10's 12 bits
    // instead of saturating at 2), the distinct candidate union and
    // the rerank — live at any SF: 4x8 bits at the oracle SFs, 4x9 at
    // sf1, 4x12 at sf10.
    Q("e18_lsh_multitable",
      (s, d) => Similarity.lshKnnMulti(
          Tables.embeddings(s, d)
            .select(col("vec_id"), quantize(col("embedding")).as("embedding")),
          k = 5, tables = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rank"),
      Some {
        val ladder = Similarity.lshDimLadder(64)
        val sigFull = ladder
          .map(i => s"(CASE WHEN qv[$i] >= 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")
        s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
           |p1 AS (SELECT greatest(8, least(24,
           |         length(bin(greatest(((count(*) + 63) // 64) - 1, 1))))) AS bits
           |       FROM q),
           |p AS (SELECT bits, least(4, ${ladder.length} // bits) AS tabs FROM p1),
           |sig AS (SELECT vec_id, qv, $sigFull AS s32 FROM q),
           |bk AS (
           |  SELECT vec_id, qv, t,
           |    substr(s32, CAST(t * (SELECT bits FROM p) + 1 AS INT),
           |           CAST((SELECT bits FROM p) AS INT)) AS bucket
           |  FROM sig, unnest(range(0, (SELECT tabs FROM p))) AS r(t)),
           |cand AS (
           |  SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
           |  FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
           |    AND x.vec_id <> y.vec_id),
           |scored AS (
           |  SELECT c.query_id, c.neighbor_id, $cosDuck AS cos
           |  FROM cand c
           |  JOIN q a ON a.vec_id = c.query_id
           |  JOIN q b ON b.vec_id = c.neighbor_id),
           |ranked AS (
           |  SELECT query_id, neighbor_id, cos,
           |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           |  FROM scored)
           |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
           |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // IVF ANN: KMeans cells + nprobe centroid probing (the
    // billion-vector scale path next to the LSH variant). The index is
    // built once per dataset (sample-trained KMeans, ~√n cells) and
    // WRITTEN partitioned by cell; the probe reads only probed cells'
    // files. FULL-REPLAY oracle (round 14; rounds 7-13 gated a live
    // recall floor): DuckDB recomputes sample order, coarse Lloyd,
    // assignment, probed cells and the exact cosine ranking from the
    // raw parquet floats (ivfReplayPrefix) and hash-matches every
    // ranked neighbor row — broken assignment, pruning, scoring or
    // ranking flips rows directly. The recall QUALITY story moves to
    // specs: e14's gate pins full-probe == brute force, and the
    // 32-cluster planted fixture pins nprobe=4 recall floors
    // (SimilaritySpec); the gate no longer pays the nprobe=nlist exact
    // arm, so fn IS the production probe (no benchFn override needed).
    Q("e06_ivf_knn",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.probeIvf(Similarity.ivfIndexFor(emb, key = d),
            emb.filter(col("vec_id") % 20 === 0), k = 5, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rank")
      },
      Some(e06ReplayOracle)),

    // SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup — the
    // corpus-vs-corpus scale path e01/d07 lack. K-means cells bound the
    // candidate search to Σ|cell|² pairs (vs n² all-pairs); within each
    // near-dup component the member farthest from its centroid survives.
    // FULLY LIVE oracle (round 14; rounds 9-13 froze the trained cell
    // centers as FrozenModels.semCellsSql): semDedup's trainer is the
    // SAME xxhash64-sampled 10-iteration Lloyd as buildIvfIndex, so the
    // lloydReplayCtes recursive CTE recomputes the centers from the raw
    // floats — byte-identical output to the frozen-literal form at
    // sf0.01 (verified before landing) and now SF-independent. The
    // data-plane pipeline — nearest-cell assignment + own-centroid
    // distance, within-cell cosine>=0.3 pairs, connected components
    // (reachability closure, min-id label, the d04 pattern), and the
    // keep-farthest-from-centroid ranking — was already recomputed live.
    // ZERO frozen constants remain in the whole similarity family.
    Q("e10_semdedup",
      (s, d) => Similarity.semDedup(Tables.embeddings(s, d), threshold = 0.3)
        .orderBy("vec_id"),
      Some(s"""WITH RECURSIVE
              |$corpReplayCtes,
              |${lloydReplayCtes()},
              |v AS (SELECT vec_id, ev AS v FROM corp),
              |a AS (
              |  SELECT vec_id, v,
              |    list_position(dl, list_min(dl)) - 1 AS cell,
              |    list_min(dl) AS cdist
              |  FROM (
              |    SELECT vec_id, v,
              |      list_transform(range(len(f.cents)), k ->
              |        list_sum(list_transform(range(64), i ->
              |          (v[i + 1] - f.cents[k + 1][i + 1]) * (v[i + 1] - f.cents[k + 1][i + 1])))) AS dl
              |    FROM v CROSS JOIN cfin f
              |  )
              |),
              |pairs AS (
              |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
              |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
              |  WHERE list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1]))
              |        / (sqrt(list_sum(list_transform(range(64), i -> x.v[i+1] * x.v[i+1])))
              |         * sqrt(list_sum(list_transform(range(64), i -> y.v[i+1] * y.v[i+1])))) >= 0.3
              |),
              |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
              |reach(id, r) AS (
              |  SELECT DISTINCT s, s FROM edges
              |  UNION
              |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
              |grp AS (SELECT id AS vec_id, min(r) AS group_id FROM reach GROUP BY 1)
              |SELECT a.vec_id, a.cell::INTEGER AS cell,
              |  coalesce(g.group_id, a.vec_id) AS group_id,
              |  (row_number() OVER (PARTITION BY coalesce(g.group_id, a.vec_id)
              |     ORDER BY a.cdist DESC, a.vec_id ASC) = 1) AS keep
              |FROM a LEFT JOIN grp g ON g.vec_id = a.vec_id
              |ORDER BY a.vec_id""".stripMargin)),

    // Johnson-Lindenstrauss random projection 64→16 dims with a
    // deterministic Rademacher matrix (md5-parity signs): quantized
    // integer dots are exact, so the DuckDB oracle recomputes the same
    // matrix and the same BIGINTs from the raw floats — a live
    // independent oracle for a dimensionality-reduction kernel.
    Q("e11_random_projection",
      (s, d) => Similarity.randomProjection(Tables.embeddings(s, d), outDims = 16)
        .select(col("vec_id"), col("j").cast("long").as("j"), col("val"))
        .orderBy("vec_id", "j"),
      Some(s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
              |s AS (SELECT i.i, j.j,
              |    CASE WHEN CAST(('0x' || substr(md5(i.i || '_' || j.j), 1, 4)) AS INTEGER) % 2 = 0
              |         THEN 1 ELSE -1 END AS sgn
              |  FROM range(0, 64) AS i(i), range(0, 16) AS j(j))
              |SELECT vec_id, j, sum(qv[i + 1] * sgn)::BIGINT AS val
              |FROM q, s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // KMeans clustering of the embedding space (content categorization
    // M10 reborn over embeddings) — cluster sizes at k=10. Since r15 the
    // GATED fit is the engine's own deterministic Lloyd (xxhash64-
    // sampled, first-k-distinct init, 10 iterations — buildIvfIndex's
    // trainer at a fixed k), so the oracle is a FULL REPLAY with zero
    // frozen constants (the e08/e10 conversion applied to the last
    // kmeans gate; spark.ml KMeans parity on a separated fixture is
    // pinned by spec instead — OperatorSpecs "spark.ml kmeans parity").
    // benchFn keeps timing the spark.ml fit: the published number
    // tracks the ML-lib integration path's cost (stated policy since
    // r13, BENCH.md), and cross-round bench continuity holds.
    Q("e05_kmeans",
      (s, d) => {
        // maxCell disabled HERE (and only here): the oracle below is a
        // pure k=10 Lloyd replay with no split arm, and with k pinned
        // at 10 (not ~√n) the defaultMaxCell=65536 cap would start
        // splitting cells from roughly ~655k embeddings (~sf10-20) and
        // the gate would hash-mismatch — loudly, but for a plan-shape
        // reason, not a correctness one (ADVICE r15). Passing
        // Int.MaxValue makes the gated fit equal the replay BY
        // CONSTRUCTION at every SF; the production IVF entries
        // (e06/e08/...) keep the cap.
        val idx = Similarity.buildIvfIndex(Tables.embeddings(s, d),
          nlist = 10, maxCell = Int.MaxValue)
        val out = idx.assigned
          .groupBy(col("cell").cast("long").as("cluster"))
          .agg(count(lit(1)).as("n"))
          .orderBy("cluster")
          .localCheckpoint(true)
        idx.assigned.unpersist()
        out
      },
      // FULL-REPLAY live oracle since r15 (was: frozen spark.ml
      // centroids + live assignment): DuckDB re-derives the xxhash64
      // sample order, re-fits the 10-iteration k=10 Lloyd in a
      // recursive CTE, re-assigns every vector, and the cluster sizes
      // must hash-match — SF-independent, no trained constants.
      Some(s"""WITH RECURSIVE
              |$corpReplayCtes,
              |${lloydReplayCtes(kSql = "10")},
              |a AS (
              |  SELECT c.vec_id,
              |    CAST(list_position(dl, list_min(dl)) - 1 AS BIGINT) AS cluster
              |  FROM (
              |    SELECT corp.vec_id,
              |      list_transform(range(len(f.cents)), cc ->
              |        list_sum(list_transform(range(64), i ->
              |          (ev[i + 1] - f.cents[cc + 1][i + 1])
              |          * (ev[i + 1] - f.cents[cc + 1][i + 1])))) AS dl
              |    FROM corp CROSS JOIN cfin f
              |  ) c)
              |SELECT cluster, count(*)::BIGINT AS n
              |FROM a GROUP BY 1 ORDER BY 1""".stripMargin),
      benchFn = Some((s, d) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
        val model = new KMeans().setK(10).setSeed(42).setMaxIter(10).fit(e)
        model.transform(e)
          .groupBy(col("prediction").cast("long").as("cluster"))
          .agg(count(lit(1)).as("n"))
          .orderBy("cluster")
      })),

    // Scalar int8 quantization audit (the 4× ANN memory cut): per-vector
    // codes + integer-quantized reconstruction error. Every arithmetic
    // op in the kernel is IEEE-exact (sub/div/round/mul/abs/floor over
    // nonnegative operands), so the DuckDB oracle recomputes the same
    // longs from the raw floats — a live independent oracle, no golden.
    Q("e07_int8_quantize",
      (s, d) => Similarity.int8Quantize(Tables.embeddings(s, d)).orderBy("vec_id"),
      Some("""WITH v AS (SELECT vec_id, embedding,
             |    CAST(list_min(embedding) AS DOUBLE) AS mn,
             |    CAST(list_max(embedding) AS DOUBLE) AS mx FROM embeddings),
             |c AS (SELECT vec_id, embedding, mn, (mx - mn) / 255.0 AS scale FROM v WHERE mx > mn)
             |SELECT vec_id,
             |  CAST(list_sum(list_transform(embedding,
             |    x -> round((CAST(x AS DOUBLE) - mn) / scale))) AS BIGINT) AS code_sum,
             |  CAST(list_max(list_transform(embedding,
             |    x -> round((CAST(x AS DOUBLE) - mn) / scale))) AS BIGINT) AS code_max,
             |  CAST(list_sum(list_transform(embedding,
             |    x -> floor(abs(CAST(x AS DOUBLE) -
             |      (mn + round((CAST(x AS DOUBLE) - mn) / scale) * scale)) * 1e7))) AS BIGINT) AS err_q
             |FROM c
             |UNION ALL
             |SELECT vec_id, 0, 0, 0 FROM v WHERE mx <= mn
             |ORDER BY vec_id""".stripMargin)),

    // Product quantization (Similarity.pqEncode): 8×16 codebooks fit by
    // a driver-side deterministic Lloyd over a bounded hash-ordered
    // sample, one-pass encode. FULLY LIVE oracle (round 14; rounds 9-13
    // froze the trained codebooks as FrozenModels.pqBooksSql): the
    // subspaceLloydCtes recursive CTE recomputes the 8 per-subspace
    // 15-iteration fits from the raw floats in the driver fit's exact
    // summation order — byte-identical output to the frozen-literal
    // form at sf0.01 (verified before landing) and now SF-independent.
    // The per-vector encode — 8 subspace argmins over 16 codes with
    // strict-< tie-break, code_sum/code_hash, and the floor(err*1e6)
    // quantized reconstruction error — was already recomputed live
    // (same left-to-right double summation order).
    Q("e08_pq_encode",
      (s, d) => Similarity.pqEncode(Tables.embeddings(s, d)).orderBy("vec_id"),
      Some(s"""WITH RECURSIVE
              |$corpReplayCtes,
              |rsmp AS (SELECT pos, ev AS r FROM corp WHERE pos <= 2000),
              |$subspaceLloydCtes,
              |v AS (SELECT vec_id, ev AS v FROM corp),
              |d AS (
              |  SELECT vec_id,
              |    list_transform(range(8), j ->
              |      list_transform(range(16), c ->
              |        list_sum(list_transform(range(8), i ->
              |          (v[j * 8 + i + 1] - bb.b[j + 1][c + 1][i + 1])
              |          * (v[j * 8 + i + 1] - bb.b[j + 1][c + 1][i + 1]))))) AS dl
              |  FROM v CROSS JOIN books bb
              |),
              |e AS (
              |  SELECT vec_id,
              |    list_transform(dl, sub -> list_position(sub, list_min(sub)) - 1) AS codes,
              |    list_transform(dl, sub -> list_min(sub)) AS errs
              |  FROM d
              |)
              |SELECT vec_id,
              |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
              |  CAST(list_sum(list_transform(range(8), j -> (j + 1) * codes[j + 1])) AS BIGINT) AS code_hash,
              |  CAST(floor(list_sum(errs) * 1e6) AS BIGINT) AS err_q
              |FROM e ORDER BY vec_id""".stripMargin)),

    // IVF-PQ probe (Similarity.probeIvfPq): cells pruned by IVF, the
    // candidate scan ranked by PQ asymmetric distance over m-byte codes,
    // exact cosine re-rank of the top 32 — the production read path at
    // 10^9 vectors. FULL-REPLAY oracle (round 14; rounds 7-13 gated a
    // live 250-milli recall floor): DuckDB recomputes the shared IVF
    // prefix plus the raw-vector PQ tail — the 8 subspace Lloyd fits,
    // the per-vector encode, ADC in the kernel's flat summation order,
    // top-32, exact re-rank — and hash-matches every ranked neighbor
    // row. A broken code fit, ADC ranking or re-rank flips rows
    // directly; recall quality is spec-gated on the 32-cluster planted
    // fixture. fn IS the production probe (no benchFn override needed).
    Q("e09_ivfpq_knn",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.probeIvfPq(Similarity.ivfIndexFor(emb, key = d),
            Similarity.pqCodebooks(emb),
            emb.filter(col("vec_id") % 20 === 0), kNn = 5)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rank")
      },
      Some(e09ReplayOracle)),

    // Residual IVF-PQ — IVFADC proper (Jégou'11 §IV, the form FAISS
    // ships): PQ codebooks fit on RESIDUALS to the assigned coarse
    // centroid, ADC computed per candidate against the candidate cell's
    // query residual, exact re-rank. The residual grid is finer at the
    // same m x k budget exactly when the corpus is CLUSTERED (the
    // coarse quantizer removes each cell's mean): the spec pins
    // reconstruction error < half of raw PQ's on a 32-cluster fixture,
    // and planted-fixture recall@5 floors gate the probe's quality.
    // FULL-REPLAY oracle (round 14; was a count+floor summary): NOTHING
    // is frozen — DuckDB recomputes the entire pipeline from the raw
    // parquet floats and hash-matches every ranked neighbor row:
    // (1) the xxhash64 sample order (TextQueries' byte-exact XXH64 CTE,
    //     signed-long comparison matching Spark's orderBy),
    // (2) the 10-iteration coarse Lloyd fit as a recursive CTE — init =
    //     first k distinct sample points, strict-< argmin with ties to
    //     the lowest index, per-cell means summed IN SAMPLE ORDER
    //     (list(ev ORDER BY pos) → list_sum is left-to-right, the same
    //     sequential double accumulation as the driver-side fit), empty
    //     cells keep their previous center,
    // (3) full-corpus nearest-cell assignment,
    // (4) the 8 per-subspace 15-iteration residual-codebook Lloyd fits
    //     (one recursive CTE, subspace as a grouping column),
    // (5) the per-vector residual encode (argmin over 16 codes),
    // (6) the nprobe=4 probe (4 nearest cells by (dist, cell)),
    // (7) ADC per candidate — the 64 residual-difference terms summed
    //     flat in the kernel's j-outer/i-inner order,
    // (8) top-32 by (adc, id), exact cosine re-rank (three independent
    //     left-to-right accumulators, matching CosineSim), top-5 by
    //     (cos desc, id). Every stage verified bit-identical to the
    // engine at the oracle SFs before landing (125/125 ranked rows).
    Q("e19_ivfpq_residual",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val index = Similarity.ivfIndexFor(emb, key = d)
        Similarity.probeIvfPqResidual(index,
            Similarity.pqCodebooksResidual(index),
            emb.filter(col("vec_id") % 20 === 0), kNn = 5)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rank")
      },
      Some(e19ReplayOracle)),

    // IVF incremental APPEND — the nightly-ingest path: ~75% of the
    // corpus builds the index (trains centroids), the remaining ~25%
    // arrives later and is assigned to the EXISTING centroids and
    // appended (Similarity.appendToIvf — centroids untouched, at-rest
    // layout preserved, partition pruning unchanged). FULL-REPLAY
    // oracle (round 14; rounds 7-13 gated a live 350-milli recall
    // floor): DuckDB trains the Lloyd centers on the SAME md5-split
    // subset, assigns the full corpus — late arrivals included —
    // against them (appendToIvf's documented equality: append ==
    // one-pass assignment under frozen centers), replays the nprobe=4
    // probe and exact cosine ranking, and hash-matches every ranked
    // neighbor row. A vector lost or mis-assigned by the append flips
    // rows directly; append recall quality is spec-gated on the
    // 32-cluster planted fixture. fn IS the ingest path (no benchFn).
    Q("e12_ivf_append",
      (s, d) => {
        val em = Tables.embeddings(s, d)
        val isNew = substring(md5(concat(lit("iv#"), col("vec_id").cast("string"))), 1, 1) < "4"
        val appended = Similarity.appendToIvf(
          Similarity.buildIvfIndex(em.filter(!isNew)), em.filter(isNew))
        Similarity.probeIvf(appended, em.filter(col("vec_id") % 20 === 0),
            k = 5, nprobe = 4)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rank")
      },
      Some(e12ReplayOracle)),

    // Nearest-centroid classification over the labeled embeddings —
    // integer-exact (quantize, integer means, integer squared distances;
    // Similarity.centroidClassify), so the confusion matrix is a pure
    // function of the data and the oracle rebuilds it cell-for-cell.
    // Scale shape: one shuffle (the centroid groupBy); classification is
    // a broadcast-kernel pass with no shuffle, like the IVF assignment.
    Q("e13_centroid_classify",
      (s, d) => graft.operators.Similarity
        .centroidClassify(Tables.embeddings(s, d))
        .orderBy("label", "predicted"),
      Some("""WITH q AS (
             |  SELECT vec_id, label, i,
             |    CAST(floor((CAST(embedding[i] AS DOUBLE) + 1.0) * 1000000) AS BIGINT) AS v
             |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
             |cent AS (
             |  SELECT label AS cand, i, CAST(sum(v) // count(*) AS BIGINT) AS c
             |  FROM q GROUP BY 1, 2),
             |dist AS (
             |  SELECT q.vec_id, q.label, cent.cand,
             |    sum((q.v - cent.c) * (q.v - cent.c)) AS dist
             |  FROM q JOIN cent USING (i) GROUP BY 1, 2, 3),
             |best AS (
             |  SELECT vec_id, label, cand,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cand) AS rn
             |  FROM dist)
             |SELECT label, cand AS predicted, count(*) AS n
             |FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // LIVE oracle for the IVF machinery (round-7 answer to "snapshot
    // gates check stability, not correctness"): build the inverted file
    // AT REST on the even half of the corpus, APPEND the odd half to the
    // existing centroids/files, then probe with nprobe = nlist. Probing
    // every cell makes the ANN result EXACTLY brute-force top-k — a
    // property independent of the learned centroids — so DuckDB verifies
    // the whole pipeline (assignment kernel, partitioned write, append
    // layout, probe join, rank/tie-break) against an independent exact
    // kNN it computes itself. Any vector lost, duplicated, or mis-scored
    // anywhere in the cell plumbing breaks the hash. Vectors are
    // integer-quantized (floor(x·1000), the e01/e02 recipe) so the
    // codegen'd cosine_sim accumulates exact integers in doubles and the
    // one final division is IEEE-bit-identical cross-engine.
    Q("e14_ivf_fullprobe",
      (s, d) => {
        val emQ = Tables.embeddings(s, d)
          .select(col("vec_id"), quantize(col("embedding")).as("embedding"))
        val path = graft.sources.TmpDirs.scratch(
          s"/tmp/graft_ivf_parity/p${ProcessHandle.current().pid()}")
        val index = Similarity.buildIvfIndex(
          emQ.filter(col("vec_id") % 2 === 0), nlist = 16, atRestPath = Some(path))
        val appended = Similarity.appendToIvf(index, emQ.filter(col("vec_id") % 2 === 1))
        Similarity.probeIvf(appended, emQ.filter(col("vec_id") < 100), k = 5, nprobe = 16)
          .select(col("query_id"), col("neighbor_id"), col("rank"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
              |scored AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosDuck AS cos
              |  FROM q a JOIN q b ON a.vec_id < 100 AND a.vec_id <> b.vec_id),
              |ranked AS (
              |  SELECT query_id, neighbor_id, cos,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              |  FROM scored)
              |SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos
              |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    // MMR diversified rerank (Carbonell & Goldstein SIGIR'98): the
    // retrieval pass after ANN candidate generation — per query, greedily
    // pick 5 of the top-20 cosine candidates maximizing
    // 0.7·rel − 0.3·max-sim-to-selected. All comparisons happen on
    // micro-quantized integer cosines with λ as the integer pair 7/3, so
    // the greedy trace is bit-reproducible; the oracle replays the whole
    // selection as a recursive CTE (the n06 argmax-via-correlated-LIMIT-1
    // technique) from the raw embeddings. Scale: the rerank is one
    // shuffle of 20 rows/query + an O(n²·d) local kernel per group;
    // candidate generation composes with probeIvf at corpus scale.
    Q("e15_mmr_rerank",
      (s, d) => Similarity
        .mmrRerank(Tables.embeddings(s, d), col("vec_id") < 50, n = 20, k = 5),
      Some(mmrGreedyOracle)),

    // IVF -> MMR composition gate: the same diversified rerank fed by the
    // IVF index machinery (at-rest build on the even half + append of the
    // odd half + full probe) instead of the brute scan. At nprobe=nlist
    // the probe is EXACT under the identical metric and tie-break (the
    // e14 property), so its top-20 equals e15's brute candidates and the
    // SAME recursive-CTE oracle gates the whole composition bit-exactly —
    // index build, append, probe, candidate handoff and greedy selection.
    // bench=false: both halves are benched individually (e14/e06 probe
    // paths, e15 rerank); this entry exists to gate the composition.
    Q("e16_ivf_mmr",
      (s, d) => {
        val emQ = Tables.embeddings(s, d)
          .select(col("vec_id"), quantize(col("embedding")).as("embedding"))
        val path = graft.sources.TmpDirs.scratch(
          s"/tmp/graft_ivf_mmr/p${ProcessHandle.current().pid()}")
        val index = Similarity.buildIvfIndex(
          emQ.filter(col("vec_id") % 2 === 0), nlist = 16, atRestPath = Some(path))
        val appended = Similarity.appendToIvf(index, emQ.filter(col("vec_id") % 2 === 1))
        val cands = Similarity
          .probeIvf(appended, emQ.filter(col("vec_id") < 50), k = 20, nprobe = 16)
          .select(col("query_id"), col("neighbor_id"),
            floor(col("cos") * 1e6).cast("long").as("rel"))
        Similarity.mmrRerankCandidates(cands, Tables.embeddings(s, d), k = 5)
      },
      Some(mmrGreedyOracle),
      bench = false),

    // Contrastive training-pair mining (DPR Karpukhin'20 / SimCSE):
    // per anchor, the best positive (cos ≥ 0.3 — the e10 semantic-match
    // threshold) and the best HARD negative (highest cos below it).
    // Integer micro-cosines end-to-end, one conditional-argmax
    // aggregate over the pair stream (scale notes in
    // Similarity.contrastivePairs' scaladoc — at corpus scale the same
    // aggregate consumes probeIvf candidates instead of the brute arm).
    Q("e17_contrastive_pairs",
      (s, d) => Similarity
        .contrastivePairs(Tables.embeddings(s, d), col("vec_id") < 50,
          relThreshold = 300000L)
        .orderBy("anchor_id"),
      Some(s"""WITH q AS (SELECT vec_id, $quantDuck AS qv FROM embeddings),
              |s AS (
              |  SELECT a.vec_id AS anchor_id, b.vec_id AS vid,
              |    CAST(floor(($cosDuck) * 1e6) AS BIGINT) AS rel
              |  FROM q a JOIN q b ON a.vec_id < 50 AND a.vec_id <> b.vec_id),
              |p AS (SELECT anchor_id, vid AS pos_id, rel AS pos_rel FROM (
              |    SELECT *, row_number() OVER (PARTITION BY anchor_id
              |      ORDER BY rel DESC, vid ASC) AS rn
              |    FROM s WHERE rel >= 300000) WHERE rn = 1),
              |n AS (SELECT anchor_id, vid AS neg_id, rel AS neg_rel FROM (
              |    SELECT *, row_number() OVER (PARTITION BY anchor_id
              |      ORDER BY rel DESC, vid ASC) AS rn
              |    FROM s WHERE rel < 300000) WHERE rn = 1)
              |SELECT p.anchor_id, pos_id, pos_rel, neg_id, neg_rel
              |FROM p JOIN n USING (anchor_id) ORDER BY anchor_id""".stripMargin)),

  )

}
