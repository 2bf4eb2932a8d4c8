package graft.queries

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import graft.operators.{Dedup, QualityClassifier, Repetition}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication catalog over the `documents` table —
  * the training-data-pipeline operators (language-ID, quality scoring,
  * token counting, fingerprinting, exact/MinHash/SimHash dedup).
  *
  * Ratios are computed from integer sums (sum(hits)/sum(tokens)) rather
  * than averaged per-row doubles so the DuckDB comparison is exact — and
  * at scale the integer partial aggregates are cheaper to combine too.
  */
object TextQueries {

  private val tokensSqlDuck = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** LIVE DuckDB replay of the winnowing selection (round 7; replaces the
    * frozen sf0.01 goldens of t05/d08): the Rabin-Karp polynomial hash is
    * plain Long arithmetic, i.e. exact mod-2^64, so HUGEINT CTEs
    * reproduce every hash (powers of B=1000003 via a 24-step recursion,
    * direct polynomial per position ≡ the kernel's rolling form), convert
    * to SIGNED (the kernel's `<=` min-compare is on signed longs), and
    * re-run the rightmost-min w-window selection with a window rank.
    * Selected positions form a non-decreasing sequence, so the kernel's
    * consecutive-position dedup equals DISTINCT. Ends with `e(doc_id,
    * fp)` = the distinct posting table both gates consume.
    */
  private val winnowPostingsDuck =
    """WITH RECURSIVE
      |pw(e, p) AS (
      |  SELECT 0, 1::HUGEINT
      |  UNION ALL
      |  SELECT e + 1, (p * 1000003) % 18446744073709551616 FROM pw WHERE e < 23),
      |ds AS (
      |  SELECT doc_id, array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') AS s
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, s, i FROM ds, unnest(range(1, len(s) - 22)) AS t(i) WHERE len(s) >= 24),
      |hu AS (
      |  SELECT doc_id, i,
      |    sum((unicode(substr(s, i + 23 - e, 1))::HUGEINT * p) % 18446744073709551616)
      |      % 18446744073709551616 AS u
      |  FROM pos, pw GROUP BY 1, 2),
      |hs AS (
      |  SELECT doc_id, i,
      |    CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h,
      |    count(*) OVER (PARTITION BY doc_id) AS nh
      |  FROM hu),
      |w8 AS (SELECT doc_id, i AS wi FROM hs WHERE i <= greatest(nh - 7, 1)),
      |cand AS (
      |  SELECT w8.doc_id, w8.wi, hs.i, hs.h,
      |    row_number() OVER (PARTITION BY w8.doc_id, w8.wi ORDER BY hs.h ASC, hs.i DESC) AS rn
      |  FROM w8 JOIN hs ON hs.doc_id = w8.doc_id AND hs.i >= w8.wi AND hs.i < w8.wi + 8),
      |sel AS (SELECT DISTINCT doc_id, i, h FROM cand WHERE rn = 1),
      |e AS (SELECT DISTINCT doc_id, h AS fp FROM sel)""".stripMargin

  // ---- XXH64 replayed in DuckDB (round 7) -------------------------------
  // Spark's xxhash64(token, seed 42) rebuilt as pure HUGEINT mod-2^64 SQL
  // so simhash fingerprints get a live independent oracle. Multiplication
  // of two 64-bit values overflows INT128, so products go through a
  // 32-bit-limb mulmod; rotations are a shift pair; xor/bit_count are
  // native on HUGEINT. Generated (expanded) SQL — DuckDB macros would
  // need a second statement, which the driver's single execute() may not
  // run. Validated token-for-token against Spark's own xxhash64 output
  // over the corpus vocabulary before landing.
  private val M64 = "18446744073709551616::HUGEINT"
  /** (a*b) mod 2^64 via 32-bit limbs (args must be cheap column refs —
    * they are expanded 3x each). */
  private def mmD(a: String, b: String): String =
    s"((($a) % 4294967296) * (($b) % 4294967296) + (((($a) // 4294967296) * (($b) % 4294967296)" +
      s" + (($a) % 4294967296) * (($b) // 4294967296)) % 4294967296) * 4294967296) % $M64"
  /** 64-bit rotate-left by a constant. */
  private def rotlD(x: String, r: Int): String = {
    val lo = BigInt(2).pow(r); val hi = BigInt(2).pow(64 - r)
    s"((($x) * $lo::HUGEINT) % $M64 + ($x) // $hi::HUGEINT)"
  }
  private val xxP1 = "11400714785074694791::HUGEINT"
  private val xxP2 = "14029467366897019727::HUGEINT"
  private val xxP3 = "1609587929392839161::HUGEINT"
  private val xxP4 = "9650029242287828579::HUGEINT"
  private val xxP5 = "2870177450012600261::HUGEINT"

  /** CTE chain computing `hsh(tk, hu)` — hu = unsigned xxhash64(tk, 42) —
    * from an existing CTE `tok(tk)` of distinct ASCII tokens <= 8 bytes
    * (the guarded single-word XXH64 path; Spark processes an 8-byte word
    * round iff n = 8, a 4-byte int iff n&4, then byte tail + avalanche).
    */
  private val xxh64TokenDuck: String = {
    val r64 = "bs[1] + bs[2]*256 + bs[3]*65536 + bs[4]*16777216 + bs[5]*4294967296" +
      " + bs[6]*1099511627776 + bs[7]*281474976710656 + bs[8]*72057594037927936"
    val r32 = "bs[1] + bs[2]*256 + bs[3]*65536 + bs[4]*16777216"
    s"""st AS (SELECT tk, len(tk) AS n,
       |  list_transform(range(1, len(tk) + 1), j -> unicode(substr(tk, j, 1))::HUGEINT) AS bs
       |  FROM tok),
       |s0 AS (SELECT *, (42::HUGEINT + $xxP5 + n) % $M64 AS h0 FROM st),
       |k1 AS (SELECT *, CASE WHEN n = 8 THEN ${mmD(s"($r64) % $M64", xxP2)} END AS t1,
       |              CASE WHEN n >= 4 AND n < 8 THEN ${mmD(r32, xxP1)} END AS u1
       |       FROM s0),
       |k2 AS (SELECT *, CASE WHEN n = 8 THEN ${mmD(rotlD("t1", 31), xxP1)} END AS t2 FROM k1),
       |k3 AS (SELECT tk, n, bs, h0,
       |    CASE WHEN n = 8 THEN (${mmD(rotlD("xor(h0, t2)", 27), xxP1)} + $xxP4) % $M64
       |         WHEN n >= 4 THEN (${mmD(rotlD("xor(h0, u1)", 23), xxP2)} + $xxP3) % $M64
       |         ELSE h0 END AS h2,
       |    CASE WHEN n = 8 THEN bs[9:] WHEN n >= 4 THEN bs[5:] ELSE bs END AS tail
       |  FROM k2),
       |s3 AS (SELECT tk,
       |    list_reduce(list_prepend(h2, tail),
       |      (acc, b) -> ${mmD(rotlD(s"xor(acc, ${mmD("b", xxP5)})", 11), xxP1)}) AS h3
       |  FROM k3),
       |a1 AS (SELECT tk, ${mmD("xor(h3, h3 // 8589934592)", xxP2)} AS v FROM s3),
       |a2 AS (SELECT tk, ${mmD("xor(v, v // 536870912)", xxP3)} AS v FROM a1),
       |hsh AS (SELECT tk, xor(v, v // 4294967296) AS hu FROM a2)""".stripMargin
  }

  /** CTE chain computing `hsh(hu)` — hu = unsigned xxhash64(key, 42) —
    * from an existing CTE `keys(v)` of HUGEINT key values: Spark hashes
    * a LongType column as its 8-byte little-endian word, which is
    * exactly the n=8 single-word path above with the word value equal
    * to the key itself (mod 2^64) and an empty byte tail. The first
    * reduction normalizes v to [0, 2^64) with ((v % M) + M) % M —
    * DuckDB's % of a negative HUGEINT is negative, where Spark's
    * two's-complement long reinterpretation is always the nonnegative
    * residue, so a plain `v % M` would diverge on negative keys.
    */
  private[queries] val xxh64LongDuck: String =
    s"""s0 AS (SELECT v, (42::HUGEINT + $xxP5 + 8) % $M64 AS h0 FROM keys),
       |k1 AS (SELECT *, ${mmD(s"((v % $M64) + $M64) % $M64", xxP2)} AS t1 FROM s0),
       |k2 AS (SELECT *, ${mmD(rotlD("t1", 31), xxP1)} AS t2 FROM k1),
       |k3 AS (SELECT v, (${mmD(rotlD("xor(h0, t2)", 27), xxP1)} + $xxP4) % $M64 AS h3 FROM k2),
       |a1 AS (SELECT v, ${mmD("xor(h3, h3 // 8589934592)", xxP2)} AS x FROM k3),
       |a2 AS (SELECT v, ${mmD("xor(x, x // 536870912)", xxP3)} AS x FROM a1),
       |hsh AS (SELECT v, xor(x, x // 4294967296) AS hu FROM a2)""".stripMargin

  /** t22's frozen BPE merge table — t19's sf0.01-learned merges (the gate
    * golden; BpeSpec re-proves learnMerges reproduces it), applied as a
    * fixed tokenizer so the t22 gate is scale-factor independent.
    */
  val t22Merges: Seq[(String, String)] = Seq("e" -> "r", "i" -> "n",
    "o" -> "w", "o" -> "r", "s" -> "t", "m" -> "er", "a" -> "t", "l" -> "u",
    "a" -> "r", "p" -> "ar", "j" -> "o", "jo" -> "in")


  /** Shared t29/n25/t30 oracle core: the ENTIRE 64-step integer GD
    * training loop (hashed-bigram features, L2 micro quantization,
    * micro residuals, truncated updates) replayed as a recursive CTE,
    * ending with `zz(doc_id, y, z)` — every document's final-weight
    * logit in pico units. t29 formats per-doc rows from it; n25 rolls
    * it up into the streaming gate's event-time windows; t30 trains it
    * over the CCNet-filtered corpus by passing a different source
    * relation. The returned string has NO `WITH RECURSIVE` header so
    * callers can prepend their own CTEs. zz is consumed only AFTER the
    * recursion, so naming it as a CTE is safe (the
    * MATERIALIZED-decorrelation trap applies to CTEs the recursive arm
    * reads).
    */
  private[queries] def qualityTrainCtes(src: String): String =
    s"""toks AS (
             |  SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS y,
             |         regexp_extract_all(lower(text), '[a-z0-9]+') AS l
             |  FROM $src),
             |dp AS (
             |  SELECT doc_id, y,
             |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair
             |  FROM toks),
             |db AS (
             |  SELECT doc_id, y,
             |    CAST(concat('0x', substring(md5(pair), 1, 8)) AS BIGINT) % 1024 AS b
             |  FROM dp),
             |cnts AS (SELECT doc_id, y, b, count(*)::BIGINT AS cnt FROM db GROUP BY 1, 2, 3),
             |nrm AS (SELECT doc_id, sum(cnt * cnt)::BIGINT AS ssq FROM cnts GROUP BY 1),
             |feat0 AS (
             |  SELECT c.doc_id, c.y, c.b,
             |         CAST(floor(c.cnt * 1000000.0 / sqrt(n.ssq)) AS BIGINT) AS x
             |  FROM cnts c JOIN nrm n USING (doc_id)
             |  UNION ALL
             |  SELECT doc_id, y, 1024::BIGINT AS b, 1000000::BIGINT AS x FROM toks),
             |feat AS (  -- dummy doc keeps every bucket present in the
             |           -- gradient groupBy; x = 0 so it never moves one
             |  SELECT * FROM feat0
             |  UNION ALL
             |  SELECT -1::BIGINT, 0::BIGINT, g.range::BIGINT, 0::BIGINT FROM range(1025) g),
             |w(step, b, wm) AS (
             |  SELECT 0, g.range::BIGINT, 0::BIGINT FROM range(1025) g
             |  UNION ALL
             |  SELECT step + 1, b,
             |    CAST(wm + (CASE WHEN g >= 0 THEN (8 * g) // (nn * 1000000)
             |               ELSE -((8 * -g) // (nn * 1000000)) END) AS BIGINT)
             |  FROM (
             |    SELECT t.step, t.b, max(t.wm) AS wm, max(t.nn) AS nn,
             |           sum(t.x * t.r)::HUGEINT AS g
             |    FROM (
             |      SELECT wr.step, wr.b, wr.wm, f.doc_id, f.x,
             |        (SELECT count(*) FROM $src)::BIGINT AS nn,
             |        CAST(floor((f.y - 1.0 / (1.0 + exp(-(sum(wr.wm * f.x)
             |               OVER (PARTITION BY f.doc_id)) / 1e12))) * 1000000) AS BIGINT) AS r
             |      FROM w wr JOIN feat f USING (b)
             |      WHERE wr.step < 64) t
             |    GROUP BY t.step, t.b) gg),
             |zz AS (
             |  SELECT f.doc_id, f.y, sum(wr.wm * f.x)::BIGINT AS z
             |  FROM w wr JOIN feat0 f USING (b)
             |  WHERE wr.step = 64
             |  GROUP BY 1, 2)""".stripMargin

  /** Shared t28/t30 oracle core: the CCNet per-lang bigram LM + mean
    * surprisal + tertile bucketing as CTEs ending with
    * `c_buck(doc_id, lang, n_pairs, sur_sum, avg_micro, bucket)`.
    * Names are c_-prefixed so the block composes with qualityTrainCtes
    * (which also defines `toks`) inside one WITH. No WITH header.
    */
  private[queries] def ccnetCtes: String =
    """c_toks AS (
             |  SELECT doc_id, source, lang,
             |         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
             |  FROM documents WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 2),
             |c_pr AS (
             |  SELECT doc_id, source, lang, tk[i+1] AS w1, tk[i+2] AS w2
             |  FROM c_toks, unnest(range(0, len(tk) - 1)) AS r(i)),
             |c_big AS (SELECT lang, w1, w2, count(*) AS c_b FROM c_pr
             |        WHERE source = 'src0' GROUP BY 1, 2, 3),
             |c_uni AS (SELECT lang, w1, sum(c_b) AS c_u FROM c_big GROUP BY 1, 2),
             |c_voc AS (SELECT lang, count(DISTINCT w2) AS v FROM c_big GROUP BY 1),
             |c_sc AS (
             |  SELECT p.doc_id, p.lang,
             |    CAST(floor(ln((coalesce(u.c_u, 0) + vv.v)::DOUBLE
             |                  / (coalesce(b.c_b, 0) + 1)) * 1e6) AS BIGINT) AS sur
             |  FROM c_pr p
             |  LEFT JOIN c_big b ON p.lang = b.lang AND p.w1 = b.w1 AND p.w2 = b.w2
             |  LEFT JOIN c_uni u ON p.lang = u.lang AND p.w1 = u.w1
             |  JOIN c_voc vv ON p.lang = vv.lang),
             |c_agg AS (
             |  SELECT doc_id, lang, count(*)::BIGINT AS n_pairs,
             |         sum(sur)::BIGINT AS sur_sum,
             |         (sum(sur) // count(*))::BIGINT AS avg_micro
             |  FROM c_sc GROUP BY 1, 2),
             |c_buck AS (
             |  SELECT doc_id, lang, n_pairs, sur_sum, avg_micro,
             |    (ntile(3) OVER (PARTITION BY lang ORDER BY avg_micro, doc_id))::BIGINT AS bucket
             |  FROM c_agg)""".stripMargin

  /** t28's bucketed output (ccnetAvgMicro + the exact per-lang tertile)
    * — shared by the t28 gate and t30's prefilter stage.
    */
  private[queries] def ccnetBuckets(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    ccnetAvgMicro(s, d)
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy("lang").orderBy("avg_micro", "doc_id"))
        .cast("long"))

  /** The PRODUCTION tertile arm (benched by t28 and t30): the per-lang
    * global sort replaced by a mergeable 10-milli-nat histogram per
    * lang (surprisal spans a few nats, so bucket counts are bounded),
    * two cumulative-count thresholds resolved driver-side from the
    * sketch-sized collect, and a stateless two-comparison bucket
    * assignment. Docs inside a threshold bucket can land one tertile
    * off the exact rank — the standard sketch trade; CcnetArmsSpec
    * pins agreement everywhere else. avg_micro >= 0 by construction
    * (Laplace surprisal of a ratio >= 1), so no sign shift is needed
    * before the truncating div (t27's negative-weight trap doesn't
    * apply).
    */
  private[queries] def ccnetBucketsHist(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    ccnetTertilesHist(s, ccnetAvgMicro(s, d).localCheckpoint(true))

  /** The tertile-assignment tail of [[ccnetBucketsHist]], factored so
    * n33's streaming leg can bench the SAME production arm over its
    * streamed per-doc surprisal table (r15 verdict #1 — bench-arm
    * uniformity). `scored` must be materialized (localCheckpoint): it
    * feeds two consumers, the driver-side sketch collect and the
    * assignment join.
    */
  private[queries] def ccnetTertilesHist(s: org.apache.spark.sql.SparkSession,
      scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hist = scored
      .groupBy(col("lang"), expr("avg_micro div 10000").as("bk"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val thr = hist.groupBy(_._1).toSeq.map { case (lang, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      def cut(q: Long): Long = {
        var cum = 0L; var bk = sorted.head._2
        val it = sorted.iterator
        var done = false
        while (it.hasNext && !done) {
          val (_, b, n) = it.next(); if (!done) { cum += n; bk = b }
          if (cum >= q) done = true
        }
        bk
      }
      (lang, cut((total + 2) / 3), cut((2 * total + 2) / 3))
    }
    val thrDf = { import s.implicits._; thr.toDF("lang", "bk1", "bk2") }
    scored.join(broadcast(thrDf), Seq("lang"))
      .withColumn("bucket",
        when(expr("avg_micro div 10000") <= col("bk1"), 1L)
          .when(expr("avg_micro div 10000") <= col("bk2"), 2L)
          .otherwise(3L))
      .drop("bk1", "bk2")
  }

  val all: Seq[Q] = Seq(

    // Language-ID n-gram heuristic: stopword-alternation hit counting.
    Q("t01_langid",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val feats = docs.select(
          col("lang"),
          stopwordHits(col("text"), enStopwords).as("en_hits"),
          size(tokens(col("text"))).as("n_tokens"))
          .withColumn("predicted", when(col("en_hits") >= 2, "en").otherwise("unk"))
        feats.groupBy("lang", "predicted")
          .agg(count(lit(1)).as("n"),
               round(sum("en_hits").cast("double") / sum("n_tokens"), 6).as("stop_density"))
          .orderBy("lang", "predicted")
      },
      Some("""SELECT lang, predicted, count(*) AS n,
             | round(CAST(sum(en_hits) AS DOUBLE) / sum(n_tokens), 6) AS stop_density
             |FROM (SELECT lang,
             |  len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS en_hits,
             |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
             |  CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) >= 2
             |       THEN 'en' ELSE 'unk' END AS predicted
             | FROM documents) t
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // Quality scoring: length / stopword / punctuation features + bucket.
    Q("t02_quality",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.select(
            col("doc_id"), col("source"),
            size(tokens(col("text"))).as("n_words"),
            col("n_chars"),
            stopwordHits(col("text"), enStopwords).as("stop_hits"),
            size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))).as("n_punct"))
          .withColumn("quality",
            when(col("n_words").between(20, 1000) && col("stop_hits") > 0, "ok").otherwise("low"))
          .groupBy("source", "quality")
          .agg(count(lit(1)).as("n"),
               round(sum("stop_hits").cast("double") / sum("n_words"), 6).as("stop_ratio"),
               round(sum("n_chars").cast("double") / sum("n_words"), 4).as("chars_per_word"))
          .orderBy("source", "quality")
      },
      Some("""SELECT source, quality, count(*) AS n,
             | round(CAST(sum(stop_hits) AS DOUBLE)/sum(n_words), 6) AS stop_ratio,
             | round(CAST(sum(n_chars) AS DOUBLE)/sum(n_words), 4) AS chars_per_word
             |FROM (SELECT source, n_chars,
             |   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
             |   len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS stop_hits,
             |   CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) BETWEEN 20 AND 1000
             |         AND len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) > 0
             |        THEN 'ok' ELSE 'low' END AS quality
             |  FROM documents) t
             |GROUP BY 1,2 ORDER BY 1,2""".stripMargin)),

    // Token counting: whitespace + BPE-ish regex tokenizers.
    Q("t03_token_count",
      (s, d) => Tables.documents(s, d)
        .select(col("source"),
          wsTokenCount(col("text")).as("ws_tokens"),
          bpeishTokenCount(col("text")).as("bpe_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum("ws_tokens").cast("long").as("total_ws_tokens"),
             sum("bpe_tokens").cast("long").as("total_bpe_tokens"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
             | CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_ws_tokens,
             | CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Document fingerprinting: md5 over the normalized token stream.
    Q("t04_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), fingerprint(col("text")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(col("fp")).as("n_unique"),
             min(col("fp")).as("min_fp"))
        .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_unique,
              | min(fp) AS min_fp
              |FROM (SELECT source, md5(array_to_string($tokensSqlDuck, ' ')) AS fp
              |      FROM documents) t
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact dedup: content-hash grouping, smallest doc_id kept.
    Q("d01_exact_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.select(col("doc_id"), col("source"), fingerprint(col("text")).as("fp"))
          .groupBy("source", "fp")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_unique"),
               sum(when(col("n_copies") > 1, col("n_copies") - 1).otherwise(0)).cast("long").as("n_dropped"))
          .orderBy("source")
      },
      Some(s"""SELECT source, count(*) AS n_unique,
              | CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_dropped
              |FROM (SELECT source, min(doc_id) AS keep_id, count(*) AS n_copies
              |      FROM (SELECT doc_id, source,
              |              md5(array_to_string($tokensSqlDuck, ' ')) AS fp
              |            FROM documents) t
              |      GROUP BY source, fp) g
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MinHash-LSH near-dup pipeline: shingle → 8 minhashes → 4 bands →
    // band-join candidates → exact-Jaccard verify.
    Q("d02_minhash_neardups",
      (s, d) => Dedup.minhashNearDups(Tables.documents(s, d))
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
      Some(minhashOracle)),

    // SimHash blocking. LIVE oracle since round 7 (was a frozen sf0.01
    // golden justified by "xxhash64 has no DuckDB twin" — it does now):
    // the oracle replays Spark's XXH64 (seed 42) byte-for-byte in
    // HUGEINT mod-2^64 arithmetic — 32-bit-limb mulmod avoids INT128
    // overflow, rotations are shift-pairs, xor/bit_count are native —
    // then re-derives per-doc bit-majority fingerprints from occurrence
    // counts, the 4x16-bit band join and the hamming distances. Token
    // hashing is validated against Spark's own xxhash64 for the whole
    // corpus vocabulary (tokens here are <= 8 bytes, so the single-word
    // XXH64 path applies; a longer token would diverge loudly, not
    // silently — the stripe loop is deliberately not replayed).
    // Kernel/column parity stays property-tested in DedupSpec.
    Q("d03_simhash_candidates",
      (s, d) => Dedup.simhashCandidates(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH occ AS (
              |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk FROM documents),
              |tc AS (SELECT doc_id, tk, count(*)::BIGINT AS cnt FROM occ GROUP BY 1, 2),
              |tok AS (SELECT DISTINCT tk FROM tc),
              |$xxh64TokenDuck,
              |bits AS (
              |  SELECT tc.doc_id, j.j,
              |    CASE WHEN sum(CASE WHEN (hu // (2::HUGEINT ^ j.j)::HUGEINT) % 2 = 1
              |                       THEN cnt ELSE -cnt END) >= 0
              |         THEN (2::HUGEINT ^ j.j)::HUGEINT ELSE 0::HUGEINT END AS bit
              |  FROM tc JOIN hsh USING (tk), range(0, 64) AS j(j)
              |  GROUP BY 1, 2),
              |fp AS (SELECT doc_id, sum(bit)::HUGEINT % 18446744073709551616::HUGEINT AS fpu
              |       FROM bits GROUP BY 1),
              |banded AS (
              |  SELECT doc_id, fpu, b.b AS band,
              |    (fpu // (2::HUGEINT ^ (16 * b.b))::HUGEINT) % 65536 AS key
              |  FROM fp, range(0, 4) AS b(b))
              |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  bit_count(xor(a.fpu, b.fpu))::INTEGER AS hamming
              |FROM banded a JOIN banded b
              |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
              |ORDER BY 1, 2""".stripMargin)),

    // Fuzzy duplicate candidates: edit-distance pairs, counted per brand.
    // Aggregate-then-pair: the Levenshtein loop runs over the DISTINCT
    // (brand, name) matrix — cardinality-bound, not row-bound — and a
    // matched name pair (n_a < n_b) stands for cnt_a*cnt_b row pairs
    // (each unordered row pair appears exactly once under the partkey
    // order, and dist>0 excludes same-name pairs). On this data that is
    // ~50k comparisons instead of the ~8M row-level pairs the round-2
    // length-bucket block failed to prune (7-12-char names collapse to
    // ~3 buckets — measured, then replaced). At 100 TB the map-side
    // combine reduces the scan to the distinct matrix and the quadratic
    // loop never sees the row count; |len diff|<=3 (Levenshtein lower
    // bound) plus the threshold form of levenshtein() prune within it.
    Q("d05_fuzzy_match",
      (s, d) => {
        val g = Tables.part(s, d)
          .groupBy(col("p_brand"), col("p_name"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("len", length(col("p_name")))
          // both self-join sides off one materialization: saves the
          // part scan+groupBy re-execution (plain checkpoint — the
          // brand-keyed join exchanges stay AQE-managed so a hot brand
          // can still be skew-split)
          .localCheckpoint(true)
        val a = g.alias("a")
        val b = g.alias("b")
        a.join(b, col("a.p_brand") === col("b.p_brand") &&
            col("a.p_name") < col("b.p_name") &&
            abs(col("a.len") - col("b.len")) <= 3)
          .select(col("a.p_brand").as("brand"),
            levenshtein(col("a.p_name"), col("b.p_name"), 3).as("dist"),
            (col("a.cnt") * col("b.cnt")).as("w"))
          .filter(col("dist") <= 3 && col("dist") > 0)
          .groupBy("brand")
          .agg(sum("w").cast("long").as("n_pairs"), min("dist").cast("long").as("min_dist"))
          .orderBy("brand")
      },
      Some("""SELECT brand, count(*) AS n_pairs, min(dist) AS min_dist
             |FROM (SELECT a.p_brand AS brand, levenshtein(a.p_name, b.p_name) AS dist
             |      FROM part a JOIN part b
             |        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey) t
             |WHERE dist <= 3 AND dist > 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling-hash
    // k-gram minima per w-window — density ~2/(w+1) independent of doc
    // size. Kernel brute-force-parity + guarantee properties in
    // DedupSpec; gate is a LIVE DuckDB replay of the full selection
    // since round 7 (winnowPostingsDuck — the mod-2^64 polynomial hash
    // and the rightmost-min windows recomputed from the raw text).
    Q("t05_winnow_fingerprints",
      (s, d) => {
        // k=24 chars ≈ 4 words on this corpus — measured: 8-char grams
        // over a ~30-word vocabulary collide across unrelated docs
        val fps = Dedup.winnowFingerprints(Tables.documents(s, d), k = 24, w = 8)
        Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(fps, "doc_id")
          .select(col("source"), explode(col("fps")).as("fp"))
          .groupBy("source")
          .agg(count(lit(1)).as("total_fps"),
            countDistinct(col("fp")).as("distinct_fps"))
          .orderBy("source")
      },
      Some(s"""$winnowPostingsDuck
              |SELECT d.source, count(*)::BIGINT AS total_fps,
              |       count(DISTINCT s.h)::BIGINT AS distinct_fps
              |FROM sel s JOIN (SELECT doc_id, source FROM documents) d USING (doc_id)
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Winnowing near-dup candidates: docs sharing >= 4 selected
    // fingerprints — the blocker winnowing exists for (shared substrings
    // of length >= w+k-1 guarantee a shared fingerprint, so candidates
    // surface from an equi-join, never an all-pairs scan).
    Q("d08_winnow_candidates",
      // idsBounded: synthetic doc_ids are a 0-based sequence, known
      // statically to fit [0, 2^31) — skips the packed-key guard's 1-row
      // min/max probe job (one fewer scan of the posting checkpoint)
      (s, d) => Dedup.winnowCandidates(Tables.documents(s, d), k = 24, w = 8,
          idsBounded = true)
        .orderBy("doc_a", "doc_b"),
      // LIVE since round 7: the same winnowing replay, then the kernel's
      // df-capped posting join (2 <= df <= 64) and the >= 4 shared-fp cut
      Some(s"""$winnowPostingsDuck,
              |ok AS (SELECT fp FROM e GROUP BY 1 HAVING count(*) BETWEEN 2 AND 64),
              |pruned AS (SELECT e.doc_id, e.fp FROM e JOIN ok USING (fp))
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
              |FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |GROUP BY 1, 2 HAVING count(*) >= 4
              |ORDER BY 1, 2""".stripMargin)),

    // Direct n-gram Jaccard near-dups: df-pruned inverted index for
    // candidates (fan-out bounded at maxDf² pairs per gram — the
    // stop-gram skew guard), exact Jaccard over full gram sets.
    Q("d09_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardDups(Tables.documents(s, d))
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
      Some("""WITH words AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS gram
             |  FROM words, unnest(range(1, len(ws) - 3)) AS t(i) WHERE len(ws) >= 5),
             |rare AS (SELECT gram FROM sh GROUP BY 1 HAVING count(*) BETWEEN 2 AND 20),
             |idx AS (SELECT s.doc_id, s.gram FROM sh s JOIN rare r USING (gram)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM idx a JOIN idx b ON a.gram = b.gram AND a.doc_id < b.doc_id),
             |cm AS (
             |  SELECT c.doc_a, c.doc_b, count(*) AS common
             |  FROM cand c
             |  JOIN sh sa ON sa.doc_id = c.doc_a
             |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.gram = sa.gram
             |  GROUP BY 1, 2),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
             |SELECT doc_a, doc_b,
             |  round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 4) AS jaccard
             |FROM cm JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
             |WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.05
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Directional containment (doc-inside-doc: quotes, boilerplate
    // wrappers) — the asymmetric complement of d09's symmetric Jaccard;
    // same df-capped inverted index, exact integer milli-ratios.
    Q("d12_ngram_containment",
      (s, d) => Dedup.ngramContainment(Tables.documents(s, d))
        .orderBy("doc_a", "doc_b"),
      Some("""WITH words AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS gram
             |  FROM words, unnest(range(1, len(ws) - 3)) AS t(i) WHERE len(ws) >= 5),
             |rare AS (SELECT gram FROM sh GROUP BY 1 HAVING count(*) BETWEEN 2 AND 20),
             |idx AS (SELECT s.doc_id, s.gram FROM sh s JOIN rare r USING (gram)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM idx a JOIN idx b ON a.gram = b.gram AND a.doc_id < b.doc_id),
             |cm AS (
             |  SELECT c.doc_a, c.doc_b, count(*) AS common
             |  FROM cand c
             |  JOIN sh sa ON sa.doc_id = c.doc_a
             |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.gram = sa.gram
             |  GROUP BY 1, 2),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
             |SELECT doc_a, doc_b, common, na.n AS na, nb.n AS nb,
             |  (common * 1000) // least(na.n, nb.n) AS cont_milli
             |FROM cm JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
             |WHERE (common * 1000) // least(na.n, nb.n) >= 500
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Incremental ingest dedup: a NEW batch (hash-split ~25% of the
    // corpus, t07's recipe) deduped against the HISTORICAL corpus — the
    // shape every production ingest runs nightly. Exact layer: content
    // fingerprint anti-join against history (never pairwise); near-dup
    // layer: surviving docs run the df-capped inverted index against
    // history ONLY (Dedup.ngramJaccardAgainst — no new×new, no old×old
    // re-work). Output: per-source admission audit.
    Q("d13_incremental_dedup",
      (s, d) => {
        // the fingerprinted corpus feeds hist (2 consumers) and fresh
        // (3 consumers): materialize the tokenize+md5 pass once
        val docs = Tables.documents(s, d)
          .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
          .localCheckpoint(true)
        val isNew = substring(md5(col("text")), 1, 1) < "4" // ~25% arrive "tonight"
        val hist = docs.filter(!isNew)
        val fresh = docs.filter(isNew)
        val exactSurvivors = fresh.join(hist.select("fp").distinct(),
          Seq("fp"), "left_anti")
        val nearHits = Dedup.ngramJaccardAgainst(
            exactSurvivors.select(col("doc_id"), col("text")),
            hist.select(col("doc_id"), col("text")))
          .select(col("doc_a").as("doc_id")).distinct()
        val admitted = exactSurvivors.join(nearHits, Seq("doc_id"), "left_anti")
        fresh.groupBy("source").agg(count(lit(1)).as("n_new"))
          .join(exactSurvivors.groupBy("source")
            .agg(count(lit(1)).as("n_exact_ok")), Seq("source"), "left")
          .join(admitted.groupBy("source")
            .agg(count(lit(1)).as("n_admitted"), sum("doc_id").as("id_sum")),
            Seq("source"), "left")
          .select(col("source"), col("n_new"),
            coalesce(col("n_exact_ok"), lit(0L)).as("n_exact_ok"),
            coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
            coalesce(col("id_sum"), lit(0L)).as("id_sum"))
          .orderBy("source")
      },
      Some("""WITH dd AS (SELECT doc_id, source, text,
             |    md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
             |  FROM documents),
             |marked AS (SELECT *, substr(md5(text), 1, 1) < '4' AS is_new FROM dd),
             |hist AS (SELECT * FROM marked WHERE NOT is_new),
             |fresh AS (SELECT * FROM marked WHERE is_new),
             |ex AS (SELECT f.* FROM fresh f
             |  WHERE f.fp NOT IN (SELECT fp FROM hist)),
             |words AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
             |  FROM (SELECT doc_id, text FROM ex UNION ALL SELECT doc_id, text FROM hist) u),
             |sh AS (SELECT DISTINCT doc_id,
             |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS gram
             |  FROM words, unnest(range(1, len(ws) - 3)) AS t(i) WHERE len(ws) >= 5),
             |rare AS (SELECT gram FROM sh GROUP BY 1 HAVING count(*) BETWEEN 2 AND 20),
             |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM sh a JOIN rare ra ON ra.gram = a.gram
             |  JOIN sh b ON b.gram = a.gram
             |  JOIN ex ON ex.doc_id = a.doc_id
             |  JOIN hist h ON h.doc_id = b.doc_id),
             |cm AS (SELECT c.doc_a, c.doc_b, count(*) AS common
             |  FROM cand c
             |  JOIN sh sa ON sa.doc_id = c.doc_a
             |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.gram = sa.gram
             |  GROUP BY 1, 2),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |near AS (SELECT DISTINCT cm.doc_a AS doc_id FROM cm
             |  JOIN n na ON na.doc_id = cm.doc_a JOIN n nb ON nb.doc_id = cm.doc_b
             |  WHERE CAST(cm.common AS DOUBLE) / (na.n + nb.n - cm.common) >= 0.5),
             |adm AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM near))
             |SELECT f.source,
             |  count(*) AS n_new,
             |  CAST(coalesce(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_exact_ok,
             |  CAST(coalesce(sum(CASE WHEN a.doc_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_admitted,
             |  CAST(coalesce(sum(CASE WHEN a.doc_id IS NOT NULL THEN a.doc_id END), 0) AS BIGINT) AS id_sum
             |FROM fresh f
             |LEFT JOIN ex e ON e.doc_id = f.doc_id
             |LEFT JOIN adm a ON a.doc_id = f.doc_id
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Benchmark decontamination (the GPT-3-style n-gram overlap rule):
    // flag training docs sharing ANY 8-token gram with the benchmark set
    // (src0 stands in for an eval suite). Scale shape: the benchmark gram
    // set is dim-sized next to a training corpus — it broadcasts — and
    // the corpus side streams through explode + semi-join; nothing
    // pairwise, nothing quadratic.
    Q("d11_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // typed gram kernel (the interpreted 8-gram shingle expression
        // measured 19 s vs 2 s at sf0.1 — see Dedup.gramTable)
        val bgrams = Dedup.gramTable(docs.filter(col("source") === "src0"), n = 8)
          .select("gram").distinct()
        val contaminated = Dedup.gramTable(docs.filter(col("source") =!= "src0"), n = 8)
          .join(broadcast(bgrams), Seq("gram"), "left_semi")
          .select("doc_id").distinct()
        docs.filter(col("source") =!= "src0")
          .join(contaminated.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum("hit"), lit(0L)).cast("long").as("n_contaminated"))
          .orderBy("source")
      },
      Some("""WITH words AS (
             |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
             |  FROM documents),
             |g AS (
             |  SELECT DISTINCT doc_id, source,
             |    ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||
             |    ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS gram
             |  FROM words, unnest(range(1, len(ws) - 6)) AS t(i) WHERE len(ws) >= 8),
             |cont AS (
             |  SELECT DISTINCT doc_id FROM g
             |  WHERE source <> 'src0'
             |    AND gram IN (SELECT gram FROM g WHERE source = 'src0'))
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
             |FROM documents WHERE source <> 'src0'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sequence packing for pretraining batches: documents laid end-to-end
    // in id order, split into fixed token-budget bins (bin = which chunk
    // the doc STARTS in). Windowed per source — the shard axis; at 100 TB
    // packing runs per ingest shard exactly like this, never globally.
    Q("t06_sequence_pack",
      (s, d) => {
        val budget = 512
        val w = Window.partitionBy("source").orderBy("doc_id")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            bpeishTokenCount(col("text")).as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .withColumn("bin", floor((col("cum") - col("n_tokens")) / budget).cast("long"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("bin_tokens"))
          .orderBy("source", "bin")
      },
      Some("""SELECT source, bin, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
             |FROM (
             |  SELECT source, doc_id, n_tokens,
             |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
             |          - n_tokens) / 512) AS BIGINT) AS bin
             |  FROM (SELECT source, doc_id,
             |          len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_tokens
             |        FROM documents) t) b
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Deterministic stratified split (train/val carve-out): membership by
    // content-hash prefix, so the split is reproducible, data-parallel
    // (no global sampling state), and stable under re-partitioning /
    // re-ingestion — md5 hex compares lexicographically the same in any
    // engine. '19' / '100' hex ≈ 10% validation.
    Q("t07_hash_split",
      (s, d) => Tables.documents(s, d)
        .withColumn("split",
          when(substring(md5(col("text")), 1, 2) < "1a", "val").otherwise("train"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(bpeishTokenCount(col("text"))).cast("long").as("n_tokens"))
        .orderBy("source", "split"),
      Some("""SELECT source,
             |  CASE WHEN substr(md5(text), 1, 2) < '1a' THEN 'val' ELSE 'train' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS n_tokens
             |FROM documents
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Phonetic-skeleton blocking: first letter + consonant skeleton
    // (soundex-style dedup blocking; engine-portable formulation).
    Q("d06_phonetic_block",
      (s, d) => Tables.part(s, d)
        .select(concat(upper(substring(col("p_name"), 1, 1)),
          regexp_replace(lower(substring(col("p_name"), 2, 100)), "[aeiou\\s]", "")).as("code"))
        .groupBy("code")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .orderBy("code"),
      Some("""SELECT code, count(*) AS n
             |FROM (SELECT upper(substr(p_name, 1, 1)) ||
             |        regexp_replace(lower(substr(p_name, 2, 100)), '[aeiou\s]', '', 'g') AS code
             |      FROM part) t
             |GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin)),

    // Near-dup CLUSTERS: minhash pairs -> connected components (min-id
    // label propagation). Oracle: recursive-CTE transitive closure over
    // the same pair set.
    Q("d04_dup_clusters",
      (s, d) => Dedup.dupClusters(Dedup.minhashNearDups(Tables.documents(s, d)))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE words AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
             |  FROM words, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
             |mh AS (
             |  SELECT doc_id, s.seed, min(md5(CAST(s.seed AS VARCHAR) || '#' || shingle)) AS mh
             |  FROM sh, (SELECT unnest(range(0, 8)) AS seed) s GROUP BY 1, 2),
             |sig AS (
             |  SELECT doc_id, CAST(seed // 2 AS INT) AS band, min(mh) || max(mh) AS sig
             |  FROM mh GROUP BY 1, 2),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
             |cm AS (
             |  SELECT c.doc_a, c.doc_b, count(*) AS common
             |  FROM cand c
             |  JOIN sh sa ON sa.doc_id = c.doc_a
             |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
             |  GROUP BY 1, 2),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |pairs AS (
             |  SELECT doc_a, doc_b FROM cm
             |  JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
             |  WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.05),
             |edges AS (
             |  SELECT doc_a AS s, doc_b AS d FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT DISTINCT s, s FROM edges
             |  UNION
             |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s)
             |SELECT id AS doc_id, min(r) AS cluster_id
             |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin)),

    // End-to-end corpus preparation — the training-data pipeline the
    // individual operators exist for, composed: quality gate (t02's
    // predicate) -> global exact dedup (d01, min-id survivor) -> MinHash
    // near-dup pairs (d02) -> cluster collapse (d04, keep component min)
    // -> surviving-corpus stats (t03's BPE-ish token count). Each stage
    // is one declarative transform, so Catalyst fuses the whole chain —
    // at 100 TB the only shuffles are the dedup groupBys and the band
    // join, exactly the per-stage scale shapes proven by d01/d02/d04.
    Q("d10_corpus_prep",
      (s, d) => {
        def ok = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"),
            size(tokens(col("text"))).as("n_words"),
            stopwordHits(col("text"), enStopwords).as("stop_hits"))
          .filter(col("n_words").between(20, 1000) && col("stop_hits") > 0)
          .select("doc_id", "source", "text")
        // ONE tokenize pass computes the fingerprint AND the stats the
        // final report needs (source, bpe token count); min_by keeps the
        // surviving doc's whole stat row, so the stats stage never
        // re-scans text. The cached frame is 3 narrow columns — unlike
        // caching keep1's text blocks, which measured SLOWER than
        // recomputation (9.97 s vs 5.49 s steady at sf0.1).
        val keepMeta = ok
          .select(fingerprint(col("text")).as("fp"),
            struct(col("doc_id"), col("source"),
              bpeishTokenCount(col("text")).as("n_bpe")).as("st"))
          .groupBy("fp").agg(min_by(col("st"), col("st.doc_id")).as("st"))
          .select(col("st.doc_id").as("doc_id"), col("st.source").as("source"),
            col("st.n_bpe").as("n_bpe"))
          .cache()
        // second (and last) corpus pass: text of the surviving docs for
        // the minhash kernel (id-set join; survivors are corpus-scale, so
        // no broadcast hint — AQE picks one when the side is small)
        val keep1 = ok.join(keepMeta.select("doc_id"), "doc_id")
        val clusters = Dedup.dupClusters(Dedup.minhashNearDups(keep1))
        val dropped = clusters
          .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
        keepMeta.join(dropped, Seq("doc_id"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bpe").cast("long").as("total_bpe_tokens"))
          .orderBy("source")
      },
      Some("""WITH RECURSIVE okd AS (
             |  SELECT doc_id, source, text FROM (
             |    SELECT doc_id, source, text,
             |      len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
             |      len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS stop_hits
             |    FROM documents) t
             |  WHERE n_words BETWEEN 20 AND 1000 AND stop_hits > 0),
             |keep1 AS (
             |  SELECT k.doc_id, k.source, k.text FROM okd k JOIN (
             |    SELECT min(doc_id) AS doc_id FROM (
             |      SELECT doc_id, md5(array_to_string(
             |        regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
             |      FROM okd) f GROUP BY fp) m USING (doc_id)),
             |words AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM keep1),
             |sh AS (
             |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
             |  FROM words, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
             |mh AS (
             |  SELECT doc_id, s.seed, min(md5(CAST(s.seed AS VARCHAR) || '#' || shingle)) AS mh
             |  FROM sh, (SELECT unnest(range(0, 8)) AS seed) s GROUP BY 1, 2),
             |sig AS (
             |  SELECT doc_id, CAST(seed // 2 AS INT) AS band, min(mh) || max(mh) AS sig
             |  FROM mh GROUP BY 1, 2),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
             |cm AS (
             |  SELECT c.doc_a, c.doc_b, count(*) AS common
             |  FROM cand c
             |  JOIN sh sa ON sa.doc_id = c.doc_a
             |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
             |  GROUP BY 1, 2),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |pairs AS (
             |  SELECT doc_a, doc_b FROM cm
             |  JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
             |  WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.05),
             |edges AS (
             |  SELECT doc_a AS s, doc_b AS d FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT DISTINCT s, s FROM edges
             |  UNION
             |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
             |dropped AS (
             |  SELECT id AS doc_id FROM reach GROUP BY 1 HAVING id <> min(r))
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(len(regexp_extract_all(lower(text),
             |    '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens
             |FROM keep1 WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gopher-style repetition quality rules (Rae et al. 2021 §A1.1): a
    // doc fails when its most-frequent word dominates (top_cnt/n_tokens
    // > 10%) or its duplicate-bigram mass is high (> 5%). Per-doc stats
    // come from ONE typed kernel pass (tokenize + count in a tight JVM
    // loop — the column-expression equivalent needs an interpreted
    // aggregate over a map state); thresholds compare as integer
    // cross-products so no double boundary can flip across engines.
    Q("t08_gopher_repetition",
      (s, d) => {
        import s.implicits._
        val stats = Tables.documents(s, d)
          .select(col("doc_id").cast("long"), col("source"), col("text"))
          .as[(Long, String, String)]
          .mapPartitions { it =>
            val re = java.util.regex.Pattern.compile("[a-z0-9]+")
            it.map { case (_, src, t) =>
              val toks = scala.collection.mutable.ArrayBuffer.empty[String]
              val m = re.matcher(t.toLowerCase(java.util.Locale.ROOT))
              while (m.find()) toks += m.group()
              val counts = scala.collection.mutable.HashMap.empty[String, Int]
              toks.foreach(w => counts.update(w, counts.getOrElse(w, 0) + 1))
              val topCnt = if (counts.isEmpty) 0L else counts.valuesIterator.max.toLong
              val bigs = scala.collection.mutable.HashSet.empty[String]
              var i = 0
              while (i + 1 < toks.length) { bigs += toks(i) + " " + toks(i + 1); i += 1 }
              (src, toks.length.toLong, topCnt,
                math.max(toks.length - 1, 0).toLong, bigs.size.toLong)
            }
          }
          .toDF("source", "n_tokens", "top_cnt", "n_bigrams", "n_dist")
        stats.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("top_cnt") * 10 > col("n_tokens"), 1L).otherwise(0L)).as("n_top_fail"),
            sum(when((col("n_bigrams") - col("n_dist")) * 20 > col("n_bigrams"), 1L)
              .otherwise(0L)).as("n_rep_fail"),
            round(sum("top_cnt").cast("double") / sum("n_tokens"), 6).as("top_frac"),
            round((sum("n_bigrams") - sum("n_dist")).cast("double") / sum("n_bigrams"), 6)
              .as("dup_bigram_frac"))
          .orderBy("source")
      },
      Some("""WITH docs AS (SELECT doc_id, source,
             |         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
             |tok AS (SELECT doc_id, unnest(toks) AS t FROM docs),
             |topw AS (SELECT doc_id, max(c) AS top_cnt
             |         FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2) GROUP BY 1),
             |big AS (SELECT doc_id, source, len(toks) AS n_tokens,
             |         greatest(len(toks) - 1, 0) AS n_bigrams,
             |         len(list_distinct(list_transform(list_zip(toks[1:-2], toks[2:-1]),
             |           x -> x[1] || ' ' || x[2]))) AS n_dist
             |        FROM docs)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN coalesce(top_cnt, 0) * 10 > n_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_top_fail,
             |  CAST(sum(CASE WHEN (n_bigrams - n_dist) * 20 > n_bigrams THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_fail,
             |  round(CAST(sum(coalesce(top_cnt, 0)) AS DOUBLE) / sum(n_tokens), 6) AS top_frac,
             |  round(CAST(sum(n_bigrams - n_dist) AS DOUBLE) / sum(n_bigrams), 6) AS dup_bigram_frac
             |FROM big LEFT JOIN topw USING (doc_id)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Corpus mixture weights (the LLaMA/Pile recipe shape): per-source
    // token mass → temperature-scaled sampling share. alpha = 0.5 on
    // purpose: sqrt is the one power IEEE 754 requires to be correctly
    // rounded, so the weight is bit-identical across engines (pow(x, .7)
    // is not); the weight is then floor-quantized so the share division
    // runs over exact integers.
    Q("t09_domain_mixture",
      (s, d) => {
        val m = Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(bpeishTokenCount(col("text"))).cast("long").as("n_tokens"))
          .withColumn("w_q", floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long"))
        // corpus totals as empty-frame window sums over the ALREADY
        // AGGREGATED per-source frame (|sources| rows — the SinglePartition
        // exchange is over dozens of rows, and the scan runs once; a
        // crossJoin(agg) form re-scans documents and plans a nested-loop
        // cross join)
        m.select(col("source"), col("n_docs"), col("n_tokens"),
            round(col("w_q").cast("double") / sum("w_q").over(), 6).as("mix_share"),
            round(col("w_q").cast("double") / sum("w_q").over() * col("n_docs") /
              sum("n_docs").over(), 8).as("doc_rate"))
          .orderBy("source")
      },
      Some("""WITH m AS (SELECT source, count(*) AS n_docs,
             |    CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1),
             |w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS w_q FROM m)
             |SELECT source, n_docs, n_tokens,
             |  round(CAST(w_q AS DOUBLE) / (SELECT sum(w_q) FROM w), 6) AS mix_share,
             |  round(CAST(w_q AS DOUBLE) / (SELECT sum(w_q) FROM w) * n_docs
             |        / (SELECT sum(n_docs) FROM w), 8) AS doc_rate
             |FROM w ORDER BY 1""".stripMargin)),

    // PII scrubbing: deterministic synthetic PII (email/phone/IPv4 —
    // the raw corpus has none, so the redaction path is actually
    // exercised) counted and redacted per source; scrub effectiveness is
    // measured as exact integer char deltas. Patterns stay in the
    // RE2-compatible subset so Spark (java.util.regex) and DuckDB (RE2)
    // agree.
    Q("t10_pii_scrub",
      (s, d) => {
        val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phone = "\\d{3}-\\d{3}-\\d{4}"
        val ip = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
        val withPii = Tables.documents(s, d).withColumn("text2",
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
            .when(col("doc_id") % 4 === 1,
              concat(col("text"), lit(" call 555-010-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .when(col("doc_id") % 4 === 2,
              concat(col("text"), lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
                lit("."), ((col("doc_id") / 256).cast("long") % 256).cast("string")))
            .otherwise(col("text")))
        val scrubbed = withPii.select(
          col("source"),
          size(regexp_extract_all(col("text2"), lit(email), lit(0))).as("n_email"),
          size(regexp_extract_all(col("text2"), lit(phone), lit(0))).as("n_phone"),
          size(regexp_extract_all(col("text2"), lit(ip), lit(0))).as("n_ip"),
          (length(col("text2")) - length(
            regexp_replace(regexp_replace(regexp_replace(col("text2"),
              email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>"))).as("char_delta"))
        scrubbed.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_email").cast("long").as("emails"),
            sum("n_phone").cast("long").as("phones"),
            sum("n_ip").cast("long").as("ips"),
            sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L).otherwise(0L))
              .as("docs_with_pii"),
            sum("char_delta").cast("long").as("chars_redacted"))
          .orderBy("source")
      },
      Some("""WITH p AS (SELECT source,
             |  CASE WHEN doc_id % 4 = 0 THEN text || ' contact user' || doc_id || '@example.com now'
             |       WHEN doc_id % 4 = 1 THEN text || ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |       WHEN doc_id % 4 = 2 THEN text || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
             |       ELSE text END AS text2
             |  FROM documents),
             |f AS (SELECT source,
             |  len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_email,
             |  len(regexp_extract_all(text2, '\d{3}-\d{3}-\d{4}')) AS n_phone,
             |  len(regexp_extract_all(text2, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ip,
             |  length(text2) - length(
             |    regexp_replace(regexp_replace(regexp_replace(text2,
             |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             |      '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
             |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')) AS char_delta
             |  FROM p)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_email) AS BIGINT) AS emails,
             |  CAST(sum(n_phone) AS BIGINT) AS phones,
             |  CAST(sum(n_ip) AS BIGINT) AS ips,
             |  CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
             |  CAST(sum(char_delta) AS BIGINT) AS chars_redacted
             |FROM f GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Heavy hitters by document frequency: tokens present in >= 1/4 of
    // the corpus (stopword/boilerplate detection, the prune list d09's
    // df cap drops). EXACT two-phase hash-agg — partial map-side counts
    // then one shuffle on the token — which IS the 100 TB shape for
    // heavy hitters with a group-by-able key: a CountMinSketch/
    // Misra-Gries pass only wins when the key set itself cannot be
    // shuffled, and its estimates would break the bit-exact gate. The
    // typed gramTable kernel (n=1) dedups tokens per doc, so count(*)
    // is df directly.
    Q("t11_heavy_hitters",
      (s, d) => {
        val thresh = Tables.docCount(s, d) / 4
        Dedup.gramTable(Tables.documents(s, d), n = 1)
          .groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") >= thresh)
          .select(col("gram").as("token"), col("df"))
          .orderBy(desc("df"), col("token"))
      },
      Some("""WITH g AS (SELECT doc_id,
             |    unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
             |  FROM documents)
             |SELECT token, count(*) AS df FROM g GROUP BY 1
             |HAVING count(*) >= (SELECT count(*) // 4 FROM documents)
             |ORDER BY df DESC, token""".stripMargin)),

    // Distributed exact quantiles (percentile_disc, upper-rank): one
    // window sort per group, rank filter picks ceil(q*n) — no
    // collect_list, no driver materialization, scales to any group size
    // the sort shuffle handles. Deterministic: the sort key includes
    // doc_id and both engines evaluate the same IEEE double q*n.
    Q("t12_rank_quantiles",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("n_chars", "doc_id")
        val wn = org.apache.spark.sql.expressions.Window.partitionBy("source")
        Tables.documents(s, d).select("source", "n_chars", "doc_id")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .withColumn("q", explode(array(Seq(0.25, 0.5, 0.75, 0.9).map(lit): _*)))
          .filter(col("rn") === ceil(col("q") * col("n")))
          .select(col("source"), col("q"), col("n_chars").as("q_value"))
          .orderBy("source", "q")
      },
      Some("""WITH r AS (SELECT source, n_chars,
             |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
             |    count(*) OVER (PARTITION BY source) AS n
             |  FROM documents)
             |SELECT source, q, n_chars AS q_value
             |FROM r, (SELECT unnest([0.25, 0.5, 0.75, 0.9]::DOUBLE[]) AS q) qs
             |WHERE rn = ceil(q * n)
             |ORDER BY source, q""".stripMargin)),

    // Deterministic stratified downsampling (Sampling.equalizeByKey):
    // every source is hash-sampled down to the smallest source's size —
    // the execution step of a domain-mixture plan (t09 computes weights;
    // this applies them). Content-hash membership = reproducible across
    // repartitioning/retries, integer-exact on both engines. Checked via
    // per-source totals + the exact id-set checksum of the kept rows.
    Q("t13_stratified_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sampled = graft.operators.Sampling.equalizeByKey(docs, "source", "text")
          .groupBy("source")
          .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("id_sum"))
        docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .join(sampled, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
            coalesce(col("id_sum"), lit(0L)).as("id_sum"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1),
             |s AS (SELECT d.source, d.doc_id, c.cnt,
             |    (SELECT min(cnt) FROM c) AS mn,
             |    CAST(('0x' || substr(md5(d.text), 1, 4)) AS INTEGER) AS bucket
             |  FROM documents d JOIN c USING (source))
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN bucket * cnt < 65536 * mn THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
             |  CAST(sum(CASE WHEN bucket * cnt < 65536 * mn THEN doc_id ELSE 0 END) AS BIGINT) AS id_sum
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Document chunking: overlapping 64-token windows with stride 48
    // (the context-window prep step for embedding/training pipelines).
    // The explode is one row PER CHUNK (not per token): chunk count is
    // integer-derived — greatest((n-17) div 48, 0) — and each row slices
    // its own window, so the fan-out is bounded by doc length / stride.
    Q("t15_chunk_windows",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ws"))
        .withColumn("n", size(col("ws")))
        .filter(col("n") > 0)
        .withColumn("chunk_idx",
          explode(sequence(lit(0), expr("greatest((n - 17) div 48, 0)"))))
        .select(col("doc_id"), col("chunk_idx"),
          expr("slice(ws, chunk_idx * 48 + 1, 64)").as("chunk"))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("chunk")).cast("long").as("n_tokens"),
          element_at(col("chunk"), 1).as("first_tok"),
          element_at(col("chunk"), -1).as("last_tok"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
             |  FROM documents),
             |b AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
             |c AS (SELECT doc_id, ws, n,
             |    unnest(range(0, greatest((n - 17) // 48, 0) + 1)) AS chunk_idx
             |  FROM b),
             |s AS (SELECT doc_id, chunk_idx,
             |    ws[chunk_idx * 48 + 1 : chunk_idx * 48 + 64] AS chunk FROM c)
             |SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
             |  chunk[1] AS first_tok, chunk[-1] AS last_tok
             |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Characteristic terms per document: TF-IDF-flavored ranking with NO
    // floats — order by (tf desc, df asc, token) ranks rare-but-frequent
    // terms first, exactly what idf weighting does, minus the
    // cross-engine transcendental-rounding risk of ln(N/df). TF from the
    // typed tokenCounts kernel, DF from the distinct gram table, one
    // keyed join on token.
    Q("t14_top_terms",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // tokenCounts emits ONE row per (doc_id, token), so df — docs
        // containing the token — is a plain row count over tf: the
        // corpus is tokenized once (was twice, via a separate gramTable
        // pass) and the materialized tf feeds both sides of the join
        val tf = Dedup.tokenCounts(docs).localCheckpoint(true)
        val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("tf"), asc("df"), asc("token"))
        tf.join(dfT, "token")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select("doc_id", "rank", "token", "tf", "df")
          .orderBy("doc_id", "rank")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
             |  FROM documents),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
             |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
             |r AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
             |    row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rank
             |  FROM tf JOIN df USING (token))
             |SELECT doc_id, rank, token, tf, df FROM r WHERE rank <= 3
             |ORDER BY doc_id, rank""".stripMargin)),

    // BPE tokenizer training, step 1: corpus-wide adjacent-pair
    // frequencies (the statistic every merge round of byte-pair encoding
    // ranks on). Pairs keep multiplicity — unlike the dedup gram tables,
    // BPE counts every occurrence. One typed flatMap pass; the
    // groupBy(pair).count gets map-side partial aggregation, so the
    // shuffle is distinct-pairs-per-partition, not occurrences — the
    // shape that holds at a 100 TB corpus (vocab² candidate space,
    // heavy-tailed counts). Ties at the cut rank break by pair text.
    Q("t16_bpe_pairs",
      (s, d) => Dedup.adjacentPairs(Tables.documents(s, d))
        .groupBy("pair").agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(30),
      Some("""WITH toks AS (
             |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents),
             |pairs AS (
             |  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair
             |  FROM toks)
             |SELECT pair, count(*)::BIGINT AS cnt FROM pairs
             |GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 30""".stripMargin)),

    // Bigram-fluency quality score: each document rated by the mean
    // corpus frequency of its adjacent token pairs (docs made of rare
    // transitions score low — the integer-exact stand-in for n-gram-LM
    // perplexity filtering, which ranks identically minus the ln()).
    // Shape at scale: corpus pair counts are vocab²-bounded, both sides
    // shuffle once on `pair`, and the per-doc agg is a partial-agg
    // groupBy — nothing pairwise, nothing driver-side.
    Q("t17_bigram_fluency",
      (s, d) => {
        // pairs feeds BOTH the corpus-frequency agg and the per-doc join;
        // materialize once so the tokenize+explode pass runs once, not
        // twice (slowest non-iterative text query in the r6 driver run)
        val pairs = Dedup.adjacentPairs(Tables.documents(s, d)).localCheckpoint(true)
        val corpus = pairs.groupBy("pair").agg(count(lit(1)).as("freq"))
        pairs.join(corpus, "pair")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_pairs"),
               sum("freq").cast("long").as("sum_freq"))
          .withColumn("fluency_milli", expr("sum_freq * 1000 div n_pairs"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents),
             |dp AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair
             |  FROM toks),
             |cf AS (SELECT pair, count(*) AS freq FROM dp GROUP BY 1)
             |SELECT doc_id, count(*)::BIGINT AS n_pairs, sum(freq)::BIGINT AS sum_freq,
             |  (sum(freq) * 1000 // count(*))::BIGINT AS fluency_milli
             |FROM dp JOIN cf USING (pair)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // KMV distinct-count sketch (Bar-Yossef'02) over each source's shingle
    // universe. The aggregation is a real mergeable sketch (bounded min-k
    // TreeSet Aggregator, map-side partials, <= k hashes per group on the
    // shuffle — operators/Sketches.scala), not a window sort: at 100 TB a
    // source has billions of distinct shingles and rank-k via window would
    // sort them all; the sketch moves 128 strings. Every retained value is
    // an exact md5, so the oracle checks the sketch content itself — the
    // estimate is integer arithmetic on the kth hash's 40-bit prefix, exact
    // in both engines (no float division).
    Q("t18_kmv_distinct",
      (s, d) => {
        val k = 128
        // map-side partial sketches in a typed kernel (<= k hashes per
        // source per partition on the shuffle); the udaf merges partials
        val hashes = graft.operators.Sketches
          .kmvShinglePartials(Tables.documents(s, d), k)
        val kmv = udaf(new graft.operators.Sketches.KmvAgg(k),
          org.apache.spark.sql.Encoders.STRING)
        hashes.groupBy("source").agg(kmv(col("h")).as("mins"))
          .select(col("source"),
            size(col("mins")).as("n_kept"),
            element_at(col("mins"), -1).as("kth_hash"),
            when(size(col("mins")) < k, size(col("mins")).cast("long"))
              .otherwise(expr(s"(${k - 1} * 1099511627776) div " +
                "cast(conv(substring(element_at(mins, -1), 1, 10), 16, 10) as bigint)"))
              .as("est_distinct"))
          .orderBy("source")
      },
      Some("""WITH toks AS (
             |  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
             |sh AS (
             |  SELECT DISTINCT source, md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
             |  FROM toks, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
             |r AS (
             |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
             |         count(*) OVER (PARTITION BY source) AS cnt
             |  FROM sh)
             |SELECT source, CAST(least(cnt, 128) AS INT) AS n_kept,
             |  max(CASE WHEN rn <= 128 THEN h END) AS kth_hash,
             |  CAST(CASE WHEN cnt < 128 THEN cnt
             |       ELSE (127 * 1099511627776) //
             |            CAST(concat('0x', substring(max(CASE WHEN rn <= 128 THEN h END), 1, 10)) AS BIGINT)
             |       END AS BIGINT) AS est_distinct
             |FROM r GROUP BY source, cnt ORDER BY source""".stripMargin)),

    // BPE merge learning (Sennrich'16) — the tokenizer-training loop that
    // turns t16's pair statistics into an actual merge table. The corpus
    // collapses ONCE to the distinct-word frequency matrix; each of the 12
    // merge steps is a tiny job over that matrix (explode symbol pairs ->
    // weighted count -> global argmax, lexicographic tie-break), with
    // per-round localCheckpoint lineage truncation. Integer counts +
    // deterministic ties => partition-invariant (BpeSpec: parity with a
    // single-threaded reference; gate: committed sf0.01 golden, 4/8-core
    // stability-checked via scripts/regen_goldens.sh).
    Q("t19_bpe_merges",
      (s, d) => graft.operators.BpeLearner
        .learnMerges(Tables.documents(s, d), steps = 12)
        .orderBy("step"),
      // LIVE oracle since round 7 (was the frozen sf0.01 merge table):
      // the 12-round greedy loop UNROLLED into generated SQL — each round
      // re-derives weighted adjacent-pair counts from the bracketed word
      // matrix, picks the argmax (count desc, pair asc — the kernel's
      // tie-break), and applies the merge via replace(), whose
      // left-to-right non-overlapping scan equals BPE's greedy
      // application (the t22 bracketed-symbol identity, spec-checked
      // against mergePair). If the corpus exhausts pairs early a round's
      // LIMIT 1 is empty and all later rounds go empty with it —
      // matching learnMerges' early stop row-for-row.
      Some {
        // every w_i/p_i is referenced twice, so MATERIALIZED is load-
        // bearing: DuckDB's default CTE inlining re-derives the whole
        // prefix per reference (measured 256 s; materialized: ~1 s)
        val steps = 12
        val rounds = (1 to steps).map { i =>
          s"""p$i AS MATERIALIZED (
             |  SELECT a, b, n FROM (
             |    SELECT syms[j] AS a, syms[j + 1] AS b, sum(freq)::BIGINT AS n
             |    FROM (SELECT regexp_extract_all(sym, '\\{([^}]*)\\}', 1) AS syms, freq
             |          FROM w${i - 1}),
             |         unnest(range(1, len(syms))) AS t(j)
             |    GROUP BY 1, 2)
             |  ORDER BY n DESC, a ASC, b ASC LIMIT 1),
             |w$i AS MATERIALIZED (
             |  SELECT replace(sym, '{' || p$i.a || '}{' || p$i.b || '}',
             |                 '{' || p$i.a || p$i.b || '}') AS sym, freq
             |  FROM w${i - 1}, p$i)""".stripMargin
        }.mkString(",\n")
        val out = (1 to steps)
          .map(i => s"SELECT $i AS step, a AS lhs, b AS rhs, n AS pair_count FROM p$i")
          .mkString("\nUNION ALL\n")
        s"""WITH wf AS (
           |  SELECT w, count(*)::BIGINT AS freq FROM (
           |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
           |    FROM documents) GROUP BY 1),
           |w0 AS MATERIALIZED (
           |  SELECT regexp_replace(w, '(.)', '{\\1}', 'g') AS sym, freq FROM wf),
           |$rounds
           |$out
           |ORDER BY step""".stripMargin
      }),

    // Count-min-sketch heavy hitters: word frequencies estimated from d=2
    // mergeable bucket-count tables of w=512 cells each. Each CMS row is a
    // plain groupBy(bucket) count — map-side combinable, bounded at d*w
    // cells on the shuffle no matter how many distinct words the corpus
    // has (the 100 TB property t11's exact two-phase agg lacks; t11's
    // comment advertises exactly this trade). Estimates are
    // min_i(cms_i[h_i(word)]) — deterministic given the md5 hash family,
    // so DuckDB reproduces the sketch bit-for-bit; the exact count is
    // carried alongside to expose the (bounded, one-sided) CMS error.
    Q("t20_cms_heavy_hitters",
      (s, d) => {
        val w = 512
        val words = Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("w"))
        def bucket(i: Int) = expr(
          s"cast(conv(substring(md5(concat('$i#', w)), 1, 8), 16, 10) as bigint) % $w")
        // ONE corpus pass (the exact counts); each CMS row then aggregates
        // the count TABLE — cms_i[b] = Σ count(w) over words hashing to b,
        // identical to counting occurrences directly, but the md5 family
        // runs once per DISTINCT word instead of once per occurrence
        // (measured 6.2 s → sub-second at sf0.1). On a real stream the
        // occurrence-level form is the mergeable one; over a table the
        // count-collapse is free.
        val exact = words.groupBy("w").agg(count(lit(1)).as("exact_n"))
          .localCheckpoint(true) // consumed 3x (2 sketches + estimate join)
        var cur = exact
        for (i <- 0 until 2) {
          val cms = exact.groupBy(bucket(i).as(s"b$i"))
            .agg(sum("exact_n").as(s"cms$i"))
          cur = cur.join(broadcast(cms), bucket(i) === col(s"b$i")).drop(s"b$i")
        }
        cur.select(col("w"), col("exact_n"),
            least(col("cms0"), col("cms1")).as("cms_est"))
          .orderBy(desc("cms_est"), desc("exact_n"), asc("w")).limit(30)
      },
      Some("""WITH wx AS (
             |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents),
             |ex AS (SELECT w, count(*) AS exact_n FROM wx GROUP BY 1),
             |c0 AS (SELECT CAST(concat('0x', substring(md5('0#' || w), 1, 8)) AS BIGINT) % 512 AS b,
             |       count(*) AS n FROM wx GROUP BY 1),
             |c1 AS (SELECT CAST(concat('0x', substring(md5('1#' || w), 1, 8)) AS BIGINT) % 512 AS b,
             |       count(*) AS n FROM wx GROUP BY 1)
             |SELECT w, exact_n, least(c0.n, c1.n) AS cms_est
             |FROM ex
             |JOIN c0 ON CAST(concat('0x', substring(md5('0#' || w), 1, 8)) AS BIGINT) % 512 = c0.b
             |JOIN c1 ON CAST(concat('0x', substring(md5('1#' || w), 1, 8)) AS BIGINT) % 512 = c1.b
             |ORDER BY cms_est DESC, exact_n DESC, w LIMIT 30""".stripMargin)),

    // Log2-binned histogram quantiles — the mergeable quantile sketch for
    // positive integers (DDSketch with γ=2, Masson'19): the corpus reduces
    // to ≤64 (bin, count) cells (bin = bit-length, pure integer), so the
    // shuffle is O(64) regardless of input size, unlike t12's exact
    // window-rank which sorts every row. Quantile q's bin is the smallest
    // with cum*1000 ≥ total*q — all-integer, so both engines agree
    // exactly; the answer is the bin's inclusive upper edge 2^bin - 1
    // (relative error ≤ 2x by construction, spec-checked vs t12's exact).
    Q("t21_hist_quantiles",
      (s, d) => graft.operators.Sketches
        .log2HistQuantiles(Tables.documents(s, d), "n_chars", Seq(500, 900, 990))
        .orderBy("q_milli"),
      Some("""WITH b AS (
             |  SELECT length(bin(n_chars)) AS bin, count(*) AS n FROM documents GROUP BY 1),
             |c AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum, sum(n) OVER () AS total FROM b),
             |q AS (SELECT unnest([500, 900, 990]) AS q_milli)
             |SELECT q_milli, min(bin) AS bin,
             |  (CAST(1 AS BIGINT) << min(bin)) - 1 AS est_upper
             |FROM q JOIN c ON c.cum * 1000 >= c.total * q.q_milli
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // BPE tokenizer APPLY — the encode pass that makes t19's learned
    // merges useful: tokenize the corpus with a FROZEN merge table (the
    // deployment shape — production tokenizers apply a trained table;
    // live learning is t19's gate; BpeSpec asserts learnMerges at sf0.01
    // reproduces exactly this table, so the composition is covered
    // without coupling this gate to the training corpus — the r6 advisor
    // finding that re-learning here silently restricted t22 to sf0.01).
    // Encoding runs over the DISTINCT word matrix (the same cardinality
    // collapse as t19/d05: the corpus may hold 10^12 word occurrences but
    // only millions of distinct words) and joins counts back, so the 12
    // chained replaces touch each distinct word once. The merge walk is
    // pure string expressions — each merge (a,b) is one
    // replace('{a}{b}' → '{ab}') over the bracketed form '{c}{h}{a}{r}{s}',
    // whose left-to-right non-overlapping semantics equal BPE's greedy
    // scan (BpeSpec asserts parity with the reference encoder, including
    // the prefix-trap and shared-boundary cases).
    Q("t22_bpe_encode",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = TextQueries.t22Merges
        val wx = docs.select(col("source"), explode(tokens(col("text"))).as("w"))
        val vocab = wx.groupBy("source", "w").agg(count(lit(1)).as("n"))
        val encoded = vocab.select("w").distinct()
          .withColumn("sym", graft.operators.BpeLearner.encodeExpr(col("w"), merges.toSeq))
          .withColumn("n_bpe", graft.operators.BpeLearner.encodedTokenCount(col("sym")))
        vocab.join(encoded, "w")
          .groupBy("source")
          .agg(sum("n").cast("long").as("n_words"),
            sum(col("n") * length(col("w"))).cast("long").as("char_tokens"),
            sum(col("n") * col("n_bpe")).cast("long").as("bpe_tokens"))
          .orderBy("source")
      },
      Some {
        // the SAME frozen merge table the query applies, innermost-first
        val chain = t22Merges.foldLeft("regexp_replace(w, '(.)', '{\\1}', 'g')") {
          case (inner, (a, b)) => s"replace($inner, '{$a}{$b}', '{$a$b}')"
        }
        s"""WITH wx AS (
           |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
           |  FROM documents),
           |vc AS (SELECT source, w, count(*) AS n FROM wx GROUP BY 1, 2),
           |enc AS (SELECT w, $chain AS sym FROM (SELECT DISTINCT w FROM vc)),
           |e2 AS (SELECT w, length(sym) - length(replace(sym, '{', '')) AS n_bpe FROM enc)
           |SELECT source, CAST(sum(n) AS BIGINT) AS n_words,
           |  CAST(sum(n * length(w)) AS BIGINT) AS char_tokens,
           |  CAST(sum(n * n_bpe) AS BIGINT) AS bpe_tokens
           |FROM vc JOIN e2 USING (w) GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Cross-SOURCE contamination audit — which pairs of ingest sources
    // share document OPENINGS (8-token prefix fingerprints: the shared
    // boilerplate/header signal; whole-document fps never cross sources
    // here — d01's dups are within-source). Reduce to DISTINCT (source,
    // prefix_fp) first — after that a fingerprint contributes at most
    // |sources| rows, so the self-join is bounded by sources²/2 per fp
    // BY CONSTRUCTION (no hot-key cap needed, unlike content-level
    // joins), and the corpus is touched by exactly one shuffle.
    Q("d15_cross_source_dups",
      (s, d) => {
        val fps = Tables.documents(s, d)
          .select(col("source"),
            md5(concat_ws(" ", slice(tokens(col("text")), 1, 8))).as("fp"))
          .distinct()
          // both self-join sides read one fp-keyed materialization —
          // without it the scan+tokenize+md5+distinct runs twice (the
          // multi-consumer class) and the join shuffles twice
          .repartition(col("fp"))
          .transform(graft.ops.Checkpoints.partitioned)
        val a = fps.alias("a"); val b = fps.alias("b")
        a.join(b, col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared_fps"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH fps AS (
             |  SELECT DISTINCT source,
             |    md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:8], ' ')) AS fp
             |  FROM documents)
             |SELECT a.source AS source_a, b.source AS source_b,
             |  count(*) AS n_shared_fps
             |FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // End-to-end ENTITY RESOLUTION — the record-linkage composite the
    // individual pieces exist for (blocking d06, edit-distance scoring
    // d05, cluster collapse d04), run as one pipeline over the part-name
    // universe: collapse to the distinct-name matrix (min partkey = the
    // deterministic name id), block on the product-type token so the
    // pairwise stage is per-block quadratic instead of global, score
    // within-block pairs with threshold-capped Levenshtein, and resolve
    // matched names into entities via connected components. At 100 TB
    // the only corpus-scale shuffle is the name groupBy; everything
    // after runs on name cardinality.
    Q("d14_entity_resolution",
      (s, d) => {
        val names = Tables.part(s, d)
          .groupBy("p_name")
          .agg(min("p_partkey").as("name_id"), count(lit(1)).as("n_parts"))
          .withColumn("blk", regexp_extract(col("p_name"), "[a-z]+$", 0))
          // three consumers (both self-join sides + the member join) —
          // materialize the name table once instead of re-running the
          // part scan + groupBy per consumer
          .localCheckpoint(true)
        val a = names.alias("a"); val b = names.alias("b")
        val pairs = a.join(b, col("a.blk") === col("b.blk") &&
            col("a.name_id") < col("b.name_id"))
          .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name"), 4))
          .filter(col("dist").between(1, 4))
          .select(col("a.name_id").as("doc_a"), col("b.name_id").as("doc_b"))
        val clusters = Dedup.dupClusters(pairs)
        val members = clusters.join(names, col("doc_id") === col("name_id"))
        val reps = names.select(col("name_id").as("cluster_id"),
          col("p_name").as("rep_name"))
        members.groupBy("cluster_id")
          .agg(count(lit(1)).as("n_names"), sum("n_parts").cast("long").as("n_parts"))
          .join(reps, "cluster_id")
          .select("rep_name", "n_names", "n_parts")
          .orderBy("rep_name")
      },
      Some("""WITH RECURSIVE names AS (
             |  SELECT p_name, min(p_partkey) AS name_id, count(*) AS n_parts
             |  FROM part GROUP BY 1),
             |blocked AS (
             |  SELECT *, regexp_extract(p_name, '[a-z]+$') AS blk FROM names),
             |pairs AS (
             |  SELECT a.name_id AS doc_a, b.name_id AS doc_b
             |  FROM blocked a JOIN blocked b
             |    ON a.blk = b.blk AND a.name_id < b.name_id
             |  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 4),
             |edges AS (
             |  SELECT doc_a AS s, doc_b AS d FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(id, r) AS (
             |  SELECT DISTINCT s, s FROM edges
             |  UNION
             |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s),
             |comp AS (SELECT id AS name_id, min(r) AS cluster_id FROM reach GROUP BY 1)
             |SELECT r.p_name AS rep_name, count(*) AS n_names,
             |  CAST(sum(n.n_parts) AS BIGINT) AS n_parts
             |FROM comp c
             |JOIN names n ON n.name_id = c.name_id
             |JOIN names r ON r.name_id = c.cluster_id
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Dataset PROFILING card — the per-source summary every corpus
    // release ships (HF dataset cards / Gopher §A3): volume, exact
    // vocabulary size, mean length, quality-pass share and exact-dup
    // rate in ONE pass over the corpus plus one over the distinct-word
    // and fingerprint tables (each a bounded aggregate; the vocab count
    // is t11's exact two-phase shape, not a sketch, because the gate
    // wants the exact card — t18's KMV is the 100 TB variant).
    Q("t25_corpus_profile",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"),
            size(tokens(col("text"))).as("n_words"),
            stopwordHits(col("text"), enStopwords).as("stop_hits"),
            fingerprint(col("text")).as("fp"))
        val base = docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_words").cast("long").as("total_words"),
            expr("sum(n_words) * 1000 div count(1)").as("mean_words_milli"),
            sum(when(col("n_words") >= 20 && col("stop_hits") > 0, 1L)
              .otherwise(0L)).cast("long").as("n_quality_ok"))
        val vocab = Tables.documents(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("w"))
          .groupBy("source").agg(countDistinct("w").as("vocab"))
        val dups = docs.groupBy("source")
          .agg((count(lit(1)) - countDistinct("fp")).cast("long").as("n_exact_dups"))
        base.join(vocab, "source").join(dups, "source")
          .orderBy("source")
      },
      Some("""WITH t AS (
             |  SELECT source, doc_id,
             |    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
             |    len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS stop_hits,
             |    md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
             |  FROM documents),
             |v AS (
             |  SELECT source, count(DISTINCT w) AS vocab
             |  FROM (SELECT source, unnest(ws) AS w FROM t) GROUP BY 1)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(len(ws)) AS BIGINT) AS total_words,
             |  CAST(sum(len(ws)) * 1000 // count(*) AS BIGINT) AS mean_words_milli,
             |  CAST(sum(CASE WHEN len(ws) >= 20 AND stop_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_quality_ok,
             |  any_value(v.vocab) AS vocab,
             |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
             |FROM t JOIN v USING (source) GROUP BY source ORDER BY source""".stripMargin)),

    // Quality-WEIGHTED deterministic sampling (the DCLM/FineWeb move:
    // don't hard-threshold quality, downsample in proportion to it).
    // Each doc computes an integer milli-quality (stopword density) and a
    // content-keyed hash in [0,1000); it survives iff hash < quality — so
    // a 0.9-quality doc keeps 90% of its mass, a 0.1 doc 10%, and the
    // decision is reproducible row-local arithmetic: no sampling state,
    // no RNG, repartition/retry-invariant (t13's membership trick,
    // weighted). Embarrassingly parallel; the only shuffle is the final
    // per-source rollup.
    Q("t23_weighted_sample",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).as("n_words"),
            stopwordHits(col("text"), enStopwords).as("stop_hits"))
          .withColumn("q_milli",
            expr("least(1000, stop_hits * 4000 div (n_words + 1))"))
          .withColumn("h", expr(
            "cast(conv(substring(md5(concat('ws#', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 1000"))
        scored.groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("h") < col("q_milli"), 1L).otherwise(0L)).cast("long").as("n_kept"),
            sum(when(col("h") < col("q_milli"), col("q_milli")).otherwise(0L))
              .cast("long").as("sum_q_kept"))
          .orderBy("source")
      },
      Some("""WITH sc AS (
             |  SELECT doc_id, source,
             |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
             |    len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b')) AS stop_hits
             |  FROM documents),
             |q AS (
             |  SELECT source,
             |    least(1000, stop_hits * 4000 // (n_words + 1)) AS q_milli,
             |    CAST(concat('0x', substring(md5('ws#' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
             |  FROM sc)
             |SELECT source, count(*) AS n_total,
             |  CAST(sum(CASE WHEN h < q_milli THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN h < q_milli THEN q_milli ELSE 0 END) AS BIGINT) AS sum_q_kept
             |FROM q GROUP BY 1 ORDER BY 1""".stripMargin)),

    // HyperLogLog distinct-count sketch (Flajolet et al. 2007) over
    // lineitem order keys: m=256 registers, bucket = low 8 hash bits,
    // rank from the remaining 56-bit window. Completes the sketch
    // family (exact HH t11, CMS t20, KMV t18, DDSketch t21) with the
    // register-max-mergeable cardinality sketch — at 100 TB the
    // groupBy(bucket).max is a 256-row map-side-combined aggregate
    // (bytes per partition over the wire), where t18's KMV must ship
    // its k minima per partition. Determinism: the rank uses the
    // TRAILING-zero count of the 56-bit window, computed in PURE
    // integer arithmetic (popcount((w & -w) - 1) + 1 — no float log
    // anywhere) instead of the paper's leading-zero count —
    // identically geometric on uniform hash bits, but bit-exact in
    // both engines: floor(log2(w)) for leading zeros rounds wrong at
    // w near 2^56, and even log2 of an exact power of two is one ulp
    // off for some exponents under libm's log-division, which a
    // truncating int cast can flip off-by-one either way.
    // The estimator numerator sum(2^-reg) is kept
    // exact by scaling to integers (2^(57-reg), summed as
    // decimal(38)/HUGEINT); the oracle recomputes xxhash64 of each
    // key in HUGEINT SQL (the validated n=8 word path) and the whole
    // estimator pipeline independently, so both the hash bits and the
    // register/estimator arithmetic are cross-engine-gated bit-exact.
    Q("t24_hll_distinct",
      (s, d) => {
        val exact = Tables.lineitem(s, d)
          .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        graft.operators.Sketches
          .hllEstimate(graft.operators.Sketches.hllRegisters(
            Tables.lineitem(s, d), "l_orderkey"))
          .crossJoin(broadcast(exact))
      },
      Some(s"""WITH keys AS (SELECT l_orderkey::HUGEINT AS v FROM lineitem),
              |$xxh64LongDuck,
              |b AS (SELECT hu % 256 AS bucket, hu // 256 AS w FROM hsh),
              |r AS (SELECT bucket,
              |        max(CASE WHEN w = 0 THEN 57
              |                 ELSE CAST(bit_count(CAST(w & (-w) AS BIGINT) - 1) + 1 AS INT) END) AS reg
              |      FROM b GROUP BY 1),
              |ag AS (SELECT count(*) AS n_present,
              |         sum((2::HUGEINT ^ (57 - reg))::HUGEINT) AS s_present FROM r),
              |st AS (SELECT n_present,
              |         s_present + (256 - n_present) * 144115188075855872::HUGEINT AS s_total
              |       FROM ag),
              |er AS (SELECT 256 - n_present AS n_zero,
              |         ${graft.operators.Sketches.hllAlphaMM} / (CAST(s_total AS DOUBLE) / 144115188075855872.0) AS est_raw
              |       FROM st),
              |ex AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS exact_distinct FROM lineitem)
              |SELECT 256 AS m, CAST(n_zero AS BIGINT) AS n_zero,
              |  round(CASE WHEN est_raw <= 640.0 AND n_zero > 0
              |             THEN 256.0 * ln(256.0 / n_zero) ELSE est_raw END, 2) AS hll_estimate,
              |  exact_distinct
              |FROM er CROSS JOIN ex""".stripMargin),
      benchFn = Some((s, d) =>
        // the gate's exact countDistinct arm is a measurement device
        // (it pins the estimate against truth; at sf10 it dominates the
        // wall); the benched number is the sketch path a production job
        // pays (BENCH.md bench-plan overrides)
        graft.operators.Sketches
          .hllEstimate(graft.operators.Sketches.hllRegisters(
            Tables.lineitem(s, d), "l_orderkey")))),

    // Exact duplicated-substring spans (Lee et al. 2022's span-level
    // dedup pass, re-expressed as an inverted gram index — see
    // Dedup.dupSpans scaladoc for the suffix-array-to-Spark mapping
    // and the scale argument). Token offsets, 8-token windows.
    Q("d16_dup_spans",
      (s, d) => Dedup.dupSpans(Tables.documents(s, d))
        .orderBy("doc_id", "span_start"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
             |occ AS (
             |  SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+8], ' ') AS gram
             |  FROM toks, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
             |dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
             |hits AS (SELECT doc_id, pos FROM occ WHERE gram IN (SELECT gram FROM dup)),
             |isl AS (
             |  SELECT doc_id, pos,
             |    sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
             |  FROM (SELECT doc_id, pos,
             |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
             |        FROM hits) l)
             |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
             |  max(pos) + 8 - min(pos) AS span_tokens
             |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin)),

    // The removal step that completes Lee'22 span dedup: cut every
    // duplicated span found by d16 out of its document and fingerprint
    // the surviving token stream (md5 of kept tokens joined by ' '),
    // so the oracle cross-checks the surgery itself, not just counts.
    // documents feeds both dupSpans and the scrub join (the d08/q46
    // multi-consumer class) but the shared upstream is only the parquet
    // scan — each branch does its own row-local tokenize, and dupSpans
    // checkpoints its gram stream internally, so nothing expensive
    // re-executes.
    Q("d17_span_scrub",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.scrubSpans(docs, Dedup.dupSpans(docs)).orderBy("doc_id")
      },
      Some(spanScrubOracle)),

    // BM25 top-k retrieval (Robertson-Sparck Jones; Lucene's idf form
    // ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75) for a fixed query
    // over the document corpus. The per-doc score is a FIXED-ORDER sum
    // of the per-term partials (conditional aggregation, one column per
    // query term) — a bare sum() would re-associate double additions
    // across partitions and can flip the rounded 4th decimal between
    // engines. Plan: one token explode feeds both the dl aggregate and
    // the tf aggregate; df (|terms| rows) and the N/avgdl scalar are
    // broadcast; top-k is TakeOrderedAndProject (no global sort).
    Q("t26_bm25",
      (s, d) => {
        val terms = Seq("hash", "join", "spark")
        // ONE token explode, ONE doc-keyed shuffle: dl and the per-term
        // tfs come out of the same map-side-combined aggregate. The r10
        // shape computed dl/g/tf/df as separate consumers of the explode
        // and re-ran the scan+tokenize up to 4x (the d08/q46
        // multi-consumer class — exchange reuse is not reliable), which
        // was the whole 4.1x sf0.1->sf1 step: the explode became
        // scan-bound and then ran four times.
        val tfCols = terms.zipWithIndex.map { case (t, i) =>
          sum(when(col("tk") === t, 1L).otherwise(0L)).as(s"tf$i")
        }
        val perDoc = Tables.documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("tk"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("dl"), tfCols: _*)
          // doc-stats table (4 longs/doc — the corpus summary, not the
          // token stream); checkpointed because it feeds the scalar agg
          // AND the scoring pass
          .localCheckpoint(true)
        // n_docs/avgdl over ALL docs + per-term dfs in one 1-row broadcast
        val dfCols = terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0L, 1.0).otherwise(0.0)).as(s"df$i"))
        val g = perDoc.agg(count(lit(1)).cast("double").as("n_docs"),
          avg("dl").as("avgdl") +: dfCols: _*)
        def termScore(i: Int) =
          when(col(s"tf$i") > 0L,
            log(lit(1.0) + (col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
              * (col(s"tf$i") * 2.2)
              / (col(s"tf$i") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
            .otherwise(lit(0.0))
        perDoc
          .filter(terms.indices.map(i => col(s"tf$i") > 0L).reduce(_ || _))
          .crossJoin(broadcast(g))
          .select(col("doc_id"),
            (termScore(0) + termScore(1) + termScore(2)).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
          .select(col("doc_id"), round(col("score"), 4).as("bm25"))
      },
      Some("""WITH occ AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk FROM documents),
             |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM occ GROUP BY 1),
             |g AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, tk, count(*)::BIGINT AS tf FROM occ
             |       WHERE tk IN ('hash', 'join', 'spark') GROUP BY 1, 2),
             |df AS (SELECT tk, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
             |sc AS (
             |  SELECT tf.doc_id, tf.tk,
             |    ln(1.0 + (g.n_docs - df.df + 0.5) / (df.df + 0.5))
             |      * (tf.tf * 2.2)
             |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / g.avgdl)) AS s
             |  FROM tf JOIN df USING (tk) JOIN dl USING (doc_id) CROSS JOIN g),
             |p AS (
             |  SELECT doc_id,
             |    coalesce(sum(CASE WHEN tk = 'hash'  THEN s END), 0.0)
             |    + coalesce(sum(CASE WHEN tk = 'join'  THEN s END), 0.0)
             |    + coalesce(sum(CASE WHEN tk = 'spark' THEN s END), 0.0) AS score
             |  FROM sc GROUP BY 1)
             |SELECT doc_id, round(score, 4) AS bm25 FROM p
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): every document scored
    // by the log-likelihood ratio of a target vs raw hashed-bigram
    // distribution — the data-selection pass that picks pretraining
    // documents resembling a target domain (here the lang='en' slice
    // stands in for the target corpus). Bigrams hash to B=256 buckets
    // (md5-prefix arithmetic, the t18 parity technique); bucket
    // log-ratios under add-1 smoothing are quantized to integer
    // micro-nats BEFORE the per-doc sum, so the oracle compare is
    // integer-exact end-to-end (no order-dependent float summation —
    // stricter than t26's rounded doubles; cross-engine ln() ulp noise
    // would need to land within ~1e-10 of a floor boundary to show).
    // Scale shape: hashing exists precisely so the feature table is
    // B rows broadcast everywhere; both count aggs are map-side-partial
    // groupBys collapsing to <=B rows; the per-doc agg shuffles one row
    // per (doc, bucket). The trailing global rank is the resampling
    // step — the gate keeps that exact single-partition window as its
    // measurement device; the BENCHED production arm replaces it with a
    // histogram-quantile threshold + stateless filter (see benchFn),
    // so the weights never leave per-doc locality at any scale.
    Q("t27_dsir_weights",
      (s, d) => {
        val all = Window.partitionBy()
        val byW = Window.orderBy(col("w_micro").desc, col("doc_id"))
        dsirWMicro(s, d)
          .withColumn("rk", row_number().over(byW).cast("long"))
          .withColumn("n_t", count(lit(1)).over(all))
          .withColumn("keep", expr("cast(rk <= (n_t + 3) div 4 as long)"))
          .drop("n_t")
          .orderBy("doc_id")
      },
      Some(dsirOracleSql),
      // production arm (BENCHED, e06/t24 convention): the global
      // resampling rank — the gate's one single-partition stage —
      // replaced by a mergeable histogram quantile: bucket w_micro at
      // 10-milli-nat width (bounded bucket count: weights span a few
      // nats), map-side-combine the bucket counts, resolve the top-25%
      // threshold bucket driver-side (sketch-sized collect), and keep
      // docs by a stateless w >= threshold filter. Keep decisions move
      // by at most one bucket vs the exact rank — the standard sketch
      // trade; the gate keeps the exact arm as its measurement device.
      benchFn = Some((s, d) =>
        dsirHistKeep(dsirWMicro(s, d).localCheckpoint(true)))),

    // CCNet-style LM-perplexity quality bucketing (Wenzek et al. 2019):
    // a per-language add-one-smoothed bigram LM is trained on a trusted
    // reference slice (here the src0 docs — CCNet's Wikipedia), every
    // document is scored by its mean token surprisal under its own
    // language's LM, and each language's corpus splits into
    // head/middle/tail perplexity tertiles (bucket 1 = most fluent) —
    // the quality gate LLaMA-style pipelines apply before training.
    // Determinism: per-bigram surprisal ln((c_u+V)/(c_b+1)) >= 0 is
    // quantized to integer micro-nats at the bigram-TYPE level (t27's
    // convention), per-doc sums and the truncating avg are pure integer
    // arithmetic, and the tertile order (avg_micro, doc_id) is total.
    // Plan: ONE tokenize pass feeds both the training counts and the
    // scoring stream (checkpointed at the fan-out — the d08/q46
    // multi-consumer class); training aggregates are map-side-combined
    // on (lang, w1[, w2]); scoring is two equi-joins against
    // vocabulary-sized LM tables (broadcastable until the bigram-type
    // table outgrows the threshold, then a plain hash join on uniform
    // keys). The per-lang tertile is the one global-sort stage: at
    // 100 TB it becomes a t21 DDSketch two-quantile threshold + a
    // stateless filter, the same replacement t27's benched arm makes.
    Q("t28_ccnet_bucket",
      (s, d) => ccnetBuckets(s, d).orderBy("doc_id"),
      Some(ccnetOracleSql),
      // production arm (BENCHED, t27 convention): the per-lang tertile
      // sort — the gate's one global-sort stage — replaced by a
      // mergeable 10-milli-nat histogram per lang (surprisal spans a
      // few nats, so bucket counts are bounded), two cumulative-count
      // thresholds resolved driver-side from the sketch-sized collect,
      // and a stateless two-comparison bucket assignment. Docs inside
      // a threshold bucket can land one tertile off the exact rank —
      // the standard sketch trade; CcnetArmsSpec pins agreement
      // everywhere else. avg_micro >= 0 by construction (Laplace
      // surprisal of a ratio >= 1), so no sign shift is needed before
      // the truncating div (t27's negative-weight trap doesn't apply).
      benchFn = Some((s, d) => ccnetBucketsHist(s, d))),

    // GPT-3-style quality classifier (Brown et al. 2020 §A): the
    // curated-vs-crawl logistic regression every LLM pipeline runs as
    // its keep/drop gate — trained HERE, live, as 64 full-batch GD
    // steps over B=1024 hashed-bigram features (en slice = the curated
    // side, t27's target convention). Everything crossing the engine
    // boundary is integer (L2-normalized micro counts, micro residuals
    // r = floor((y−σ(z/1e12))·1e6), truncated integer weight updates),
    // so the DuckDB oracle replays the ENTIRE training loop as a
    // recursive CTE — zero frozen weights, unlike n09's MLP. On this
    // corpus the model genuinely learns: train acc 0.788 vs 0.564
    // majority at sf0.01 (and the logistic loss it descends is what
    // separates this from t27's closed-form likelihood ratio). Scale
    // shape in QualityClassifier's scaladoc: one checkpointed feature
    // build, then per step ONE narrow pass + ONE ≤1025-row-per-partition
    // map-side-combined aggregate — spark.ml's own treeAggregate
    // pattern, no per-step doc-keyed shuffle at any corpus size.
    Q("t29_quality_classifier",
      (s, d) => QualityClassifier
        .classify(Tables.documents(s, d), Tables.docCount(s, d))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE
             |${qualityTrainCtes("documents")}
             |SELECT doc_id, y AS label,
             |  CAST(CASE WHEN z >= 0 THEN z // 1000000
             |       ELSE -((-z) // 1000000) END AS BIGINT) AS logit_micro,
             |  CAST(z > 0 AS BIGINT) AS keep
             |FROM zz
             |ORDER BY doc_id""".stripMargin)),

    // The modern curation COMPOSITE (the CCNet'19 → GPT-3'20 recipe in
    // one DAG): the per-lang perplexity gate keeps the head+middle
    // tertiles (t28), and the quality classifier is trained ON THE
    // FILTERED corpus — exactly how production pipelines stage it (the
    // classifier learns from cleaned data; here that lifts train acc
    // 0.788 → 0.916 vs training on raw). Docs too short to score
    // (< 2 tokens) have no perplexity and drop at the gate, as in
    // CCNet. The oracle replays BOTH stages live in one WITH RECURSIVE
    // (the shared ccnetCtes + qualityTrainCtes("src") over the
    // filtered relation) — validated equal to an independent two-stage
    // materialization. Plan shape: the tertile table is checkpointed
    // once (it feeds the filter AND the final annotation join); the
    // classifier's 64-step loop then runs off its own persisted
    // feature RDD, so the t28 lineage never re-executes inside the
    // training loop.
    Q("t30_curation_pipeline",
      (s, d) => {
        val kept = ccnetBuckets(s, d)
          .filter(col("bucket") <= 2L)
          .select(col("doc_id"), col("bucket"))
          .localCheckpoint(true)
        val docs = Tables.documents(s, d).join(kept.select("doc_id"), "doc_id")
        // survivor count off the checkpointed tertile table — counting
        // `docs` instead would re-run the corpus join a second time
        // (featureRdd is its only corpus-scale consumer)
        val n = kept.count()
        QualityClassifier.classify(docs, n)
          .join(kept, "doc_id")
          .select(col("doc_id"), col("label"), col("bucket"),
            col("logit_micro"), col("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE
             |${ccnetCtes},
             |survivors AS (SELECT doc_id, bucket FROM c_buck WHERE bucket <= 2),
             |src AS (SELECT d.* FROM documents d JOIN survivors USING (doc_id)),
             |${qualityTrainCtes("src")}
             |SELECT zz.doc_id, zz.y AS label, s.bucket,
             |  CAST(CASE WHEN z >= 0 THEN z // 1000000
             |       ELSE -((-z) // 1000000) END AS BIGINT) AS logit_micro,
             |  CAST(z > 0 AS BIGINT) AS keep
             |FROM zz JOIN survivors s ON s.doc_id = zz.doc_id
             |ORDER BY zz.doc_id""".stripMargin),
      // production arm (BENCHED): the same composite with the prefilter
      // tertile resolved by t28's histogram-threshold arm instead of
      // the exact per-lang sort — survivor sets can differ by docs
      // inside a threshold bucket (the standard sketch trade), and the
      // classifier then trains on that production survivor set; the
      // gate keeps the exact arm as its measurement device.
      benchFn = Some((s, d) => {
        val kept = ccnetBucketsHist(s, d)
          .filter(col("bucket") <= 2L)
          .select(col("doc_id"), col("bucket"))
          .localCheckpoint(true)
        val docs = Tables.documents(s, d).join(kept.select("doc_id"), "doc_id")
        QualityClassifier.classify(docs, kept.count())
          .join(kept, "doc_id")
          .select(col("doc_id"), col("label"), col("bucket"),
            col("logit_micro"), col("keep"))
      })),

    // CCNet-style corpus-level segment dedup (Wenzek'19 §2's
    // paragraph-hash pass — the pipeline stage AHEAD of t28's perplexity
    // buckets; see Dedup.segmentDedup for the 100 TB shape). Aligned
    // 10-token segments, md5 identity, global first-occurrence-wins
    // (min (doc_id, seg_idx) per hash — the oracle replays the same
    // winner with a row_number window), and the surviving text is
    // md5-fingerprinted so the SURGERY is cross-checked (the d17
    // pattern), not just the counts. At sf0.01 the corpus loses 151 of
    // 2949 segments — the gate exercises real removals.
    Q("d18_segment_dedup",
      (s, d) => Dedup.segmentDedup(Tables.documents(s, d)).orderBy("doc_id"),
      Some(segmentDedupOracle)),

    // Gopher repetition filters (Rae'21 Table A1, token-stream analogs;
    // see Repetition.signals): top-word / top-bigram / duplicated-5-gram
    // micro-fractions in PURE LONG DIVISION (no doubles on either
    // engine), keep = all three under the stated cuts. Row-local kernel,
    // zero shuffle — scan-speed at any corpus size.
    Q("t31_repetition_filter",
      (s, d) => Repetition.signals(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
             |wc AS (
             |  SELECT doc_id, sum(c)::BIGINT AS n_words, max(c)::BIGINT AS topw
             |  FROM (SELECT doc_id, w, count(*) AS c
             |        FROM toks, unnest(tk) AS u(w) GROUP BY 1, 2) GROUP BY 1),
             |g2 AS (
             |  SELECT doc_id, sum(c)::BIGINT AS n2, max(c)::BIGINT AS top2
             |  FROM (SELECT doc_id, array_to_string(tk[i+1:i+2], ' ') AS g, count(*) AS c
             |        FROM toks, unnest(range(0, greatest(len(tk) - 1, 0))) AS r(i)
             |        GROUP BY 1, 2) GROUP BY 1),
             |g5 AS (
             |  SELECT doc_id, count(*)::BIGINT AS n5, count(DISTINCT g)::BIGINT AS d5
             |  FROM (SELECT doc_id, array_to_string(tk[i+1:i+5], ' ') AS g
             |        FROM toks, unnest(range(0, greatest(len(tk) - 4, 0))) AS r(i))
             |  GROUP BY 1),
             |sig AS (
             |  SELECT t.doc_id,
             |    coalesce(wc.n_words, 0) AS n_words,
             |    CASE WHEN coalesce(wc.n_words, 0) = 0 THEN 0
             |         ELSE (1000000 * wc.topw) // wc.n_words END AS top_word_micro,
             |    CASE WHEN coalesce(g2.n2, 0) = 0 THEN 0
             |         ELSE (1000000 * g2.top2) // g2.n2 END AS top2gram_micro,
             |    CASE WHEN coalesce(g5.n5, 0) = 0 THEN 0
             |         ELSE (1000000 * (g5.n5 - g5.d5)) // g5.n5 END AS dup5gram_micro
             |  FROM toks t LEFT JOIN wc USING (doc_id)
             |  LEFT JOIN g2 USING (doc_id) LEFT JOIN g5 USING (doc_id))
             |SELECT doc_id, n_words,
             |  top_word_micro::BIGINT AS top_word_micro,
             |  top2gram_micro::BIGINT AS top2gram_micro,
             |  dup5gram_micro::BIGINT AS dup5gram_micro,
             |  (CASE WHEN top_word_micro < 200000 AND top2gram_micro < 180000
             |        AND dup5gram_micro < 300000 THEN 1 ELSE 0 END)::BIGINT AS keep
             |FROM sig ORDER BY doc_id""".stripMargin))
  )

  /** d02's DuckDB oracle — shared VERBATIM with the streaming leg n32
    * (the d18/n29 pattern): batch MinHash-LSH near-dup, the incremental
    * streaming form, and the independent SQL replay must all three
    * agree on every verified pair and its Jaccard.
    */
  // lazy: referenced by the queries map ABOVE this definition (and by
  // StreamingQueries.n32) — eager init order would hand the map a null
  private[graft] lazy val minhashOracle: String =
    """WITH words AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
      |  FROM words, unnest(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
      |mh AS (
      |  SELECT doc_id, s.seed, min(md5(CAST(s.seed AS VARCHAR) || '#' || shingle)) AS mh
      |  FROM sh, (SELECT unnest(range(0, 8)) AS seed) s GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id, CAST(seed // 2 AS INT) AS band, min(mh) || max(mh) AS sig
      |  FROM mh GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |cm AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS common
      |  FROM cand c
      |  JOIN sh sa ON sa.doc_id = c.doc_a
      |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      |  GROUP BY 1, 2),
      |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
      |SELECT doc_a, doc_b,
      |  round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 4) AS jaccard
      |FROM cm JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
      |WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.05
      |ORDER BY doc_a, doc_b""".stripMargin

  /** d17's DuckDB oracle — shared VERBATIM with the streaming leg n30
    * (the d18/n29 pattern): batch span scrub, the incremental streaming
    * form, and the independent SQL replay must all three agree on the
    * post-surgery fingerprints of EVERY document.
    */
  // lazy: referenced by the queries map ABOVE this definition (and by
  // StreamingQueries.n30) — eager init order would hand the map a null
  private[graft] lazy val spanScrubOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
      |occ AS (
      |  SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+8], ' ') AS gram
      |  FROM toks, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
      |dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      |hits AS (SELECT doc_id, pos FROM occ WHERE gram IN (SELECT gram FROM dup)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM (SELECT doc_id, pos,
      |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      |        FROM hits) l),
      |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |          FROM isl GROUP BY doc_id, island),
      |tok_pos AS (
      |  SELECT doc_id, i AS pos, tk[i+1] AS tok
      |  FROM toks, unnest(range(0, len(tk))) AS r(i)),
      |kept AS (
      |  SELECT p.doc_id, p.pos, p.tok FROM tok_pos p
      |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
      |                    WHERE sp.doc_id = p.doc_id AND p.pos BETWEEN sp.s AND sp.e)),
      |ka AS (
      |  SELECT doc_id, count(*)::BIGINT AS kept_tokens,
      |         md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_hash
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, len(tk)::BIGINT AS n_tokens,
      |  coalesce(ka.kept_tokens, 0)::BIGINT AS kept_tokens,
      |  (len(tk) - coalesce(ka.kept_tokens, 0))::BIGINT AS removed_tokens,
      |  coalesce(ka.cleaned_hash, md5('')) AS cleaned_hash
      |FROM toks t LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin

  /** d18's DuckDB oracle — shared VERBATIM with the streaming leg n29
    * (the q49/n28 pattern): batch, streaming, and the independent SQL
    * replay must all three agree on the deduped corpus.
    */
  // lazy: referenced by the queries map ABOVE this definition (and by
  // StreamingQueries.n29) — eager init order would hand the map a null
  private[graft] lazy val segmentDedupOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS tk FROM documents),
      |segs AS (
      |  SELECT doc_id, i AS seg_idx,
      |    array_to_string(tk[i*10+1 : i*10+10], ' ') AS seg
      |  FROM toks, unnest(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS r(i)),
      |h AS (SELECT doc_id, seg_idx, seg, md5(seg) AS hh FROM segs),
      |own AS (SELECT *, row_number() OVER (PARTITION BY hh
      |          ORDER BY doc_id, seg_idx) AS rn FROM h),
      |kept AS (SELECT doc_id, seg_idx, seg FROM own WHERE rn = 1),
      |ka AS (SELECT doc_id, count(*)::BIGINT AS kept_segments,
      |         md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS cleaned_hash
      |       FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, CAST(ceil(len(tk) / 10.0) AS BIGINT) AS n_segments FROM toks)
      |SELECT t.doc_id, t.n_segments,
      |  coalesce(ka.kept_segments, 0)::BIGINT AS kept_segments,
      |  (t.n_segments - coalesce(ka.kept_segments, 0))::BIGINT AS removed_segments,
      |  coalesce(ka.cleaned_hash, md5('')) AS cleaned_hash
      |FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY t.doc_id""".stripMargin

  /** t28's per-document mean-surprisal table
    * (doc_id, lang, n_pairs, sur_sum, avg_micro) — shared by the gate
    * (exact per-lang ntile tertiles) and the benched histogram arm.
    * One checkpointed tokenize pass feeds both the src0 training
    * counts and the scoring stream; the bigram explode re-runs per
    * consumer off the materialized token arrays (cheaper than
    * checkpointing the exploded occurrence stream); LM joins stay
    * AQE-managed — hot function-word bigrams are the d12 skew lesson.
    */
  private def ccnetAvgMicro(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"),
        tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .localCheckpoint(true)
    val pairs = toks
      .select(col("doc_id"), col("source"), col("lang"),
        explode(transform(slice(col("tk"), lit(1), size(col("tk")) - 1),
          (t, i) => struct(t.as("w1"),
            element_at(col("tk"), i + 2).as("w2")))).as("bg"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val big = pairs.filter(col("source") === "src0")
      .groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c_b"))
      .localCheckpoint(true)
    val uni = big.groupBy("lang", "w1").agg(sum("c_b").as("c_u"))
    val voc = big.select("lang", "w2").distinct()
      .groupBy("lang").agg(count(lit(1)).as("v"))
    pairs
      .join(big, Seq("lang", "w1", "w2"), "left")
      .join(uni, Seq("lang", "w1"), "left")
      .join(voc, Seq("lang"))
      .withColumn("sur_micro", floor(
        log((coalesce(col("c_u"), lit(0L)) + col("v"))
          .cast("double") / (coalesce(col("c_b"), lit(0L)) + lit(1L)))
          * lit(1e6)).cast("long"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum("sur_micro").cast("long").as("sur_sum"))
      .withColumn("avg_micro", expr("sur_sum div n_pairs"))
  }

  /** t28's oracle — the whole CCNet pass (per-lang src0 bigram LM,
    * Laplace mean surprisal in integer micro-nats, exact per-lang
    * tertile) recomputed live by DuckDB. Shared VERBATIM by n33, the
    * streaming leg: batch, streaming, and the independent replay must
    * all three agree on every document's score and bucket.
    */
  // lazy: referenced by the queries map ABOVE this definition (and by
  // StreamingQueries.n33) — eager init order would hand the map a null
  private[graft] lazy val ccnetOracleSql: String =
    s"""WITH
       |${ccnetCtes}
       |SELECT doc_id, lang, n_pairs, sur_sum, avg_micro, bucket
       |FROM c_buck ORDER BY doc_id""".stripMargin

  /** t27's oracle — the whole DSIR pass (hashed-bigram buckets, add-1
    * smoothed integer-micro-nat log-ratios, per-doc weights, resampling
    * rank) recomputed live by DuckDB. Shared VERBATIM by n31, the
    * streaming leg: batch, streaming, and the independent replay must
    * all three agree on every document's weight and keep decision.
    */
  private[queries] lazy val dsirOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS l FROM documents),
      |dp AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair
      |  FROM toks),
      |db AS (
      |  SELECT doc_id, lang,
      |    CAST(concat('0x', substring(md5(pair), 1, 8)) AS BIGINT) % 256 AS b
      |  FROM dp),
      |raw AS (SELECT b, count(*) AS c_r FROM db GROUP BY 1),
      |tgt AS (SELECT b, count(*) AS c_t FROM db WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT coalesce((SELECT sum(c_r) FROM raw), 0) AS rr,
      |               coalesce((SELECT sum(c_t) FROM tgt), 0) AS tt),
      |lr AS (
      |  SELECT g.range AS b,
      |    CAST(floor((ln(coalesce(c_t, 0) + 1) - ln(tt + 256)
      |              - ln(coalesce(c_r, 0) + 1) + ln(rr + 256)) * 1e6) AS BIGINT) AS lr_micro
      |  FROM range(256) g
      |  LEFT JOIN raw ON raw.b = g.range
      |  LEFT JOIN tgt ON tgt.b = g.range
      |  CROSS JOIN tot),
      |dc AS (SELECT doc_id, b, count(*) AS cnt FROM db GROUP BY 1, 2),
      |w AS (SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams,
      |             sum(cnt * lr_micro)::BIGINT AS w_micro
      |      FROM dc JOIN lr USING (b) GROUP BY 1),
      |r AS (SELECT *,
      |        (row_number() OVER (ORDER BY w_micro DESC, doc_id))::BIGINT AS rk,
      |        count(*) OVER () AS n
      |      FROM w)
      |SELECT doc_id, n_bigrams, w_micro, rk,
      |  CAST(rk <= (n + 3) // 4 AS BIGINT) AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  /** The PRODUCTION keep arm (benched by t27 and n31 — r15 verdict #1):
    * the global resampling rank — the gate's one single-partition
    * stage — replaced by a mergeable histogram quantile: bucket
    * w_micro at 10-milli-nat width (bounded bucket count: weights span
    * a few nats), map-side-combine the bucket counts, resolve the
    * top-25% threshold bucket driver-side (sketch-sized collect), and
    * keep docs by a stateless w >= threshold filter. Keep decisions
    * move by at most one bucket vs the exact rank — the standard
    * sketch trade; the gates keep the exact arm as their measurement
    * device. `w` must be materialized (localCheckpoint): it feeds the
    * sketch collect and the keep filter.
    */
  private[queries] def dsirHistKeep(w: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // weights are signed; `div` truncates toward zero, so shift to
    // non-negative first to get FLOOR buckets (else a negative
    // weight inside the threshold bucket falls below the bucket's
    // lower bound and is wrongly dropped)
    val off = 1L << 50
    val hist = w.groupBy(expr(s"(w_micro + ${off}L) div 10000").as("bk"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val total = hist.map(_._2).sum
    val quota = (total + 3) / 4
    var cum = 0L
    var thrBk = Long.MinValue
    hist.foreach { case (bk, n) =>
      if (cum < quota) { cum += n; thrBk = bk }
    }
    w.withColumn("keep",
      (col("w_micro") >= lit(thrBk * 10000L - off)).cast("long"))
  }

  /** t27's per-document DSIR weight table (doc_id, n_bigrams, w_micro) —
    * shared by the exact-rank gate arm and the histogram-threshold
    * production arm.
    */
  private def dsirWMicro(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val B = 256
    def bucket(pair: org.apache.spark.sql.Column) =
      (conv(substring(md5(pair), 1, 8), 16, 10).cast("long") % B).as("b")
    val docs = Tables.documents(s, d)
    // one tokenize pass feeds the raw counts AND the per-doc join;
    // the target slice re-tokenizes only its (small) subset
    val pairs = Dedup.adjacentPairs(docs)
      .select(col("doc_id"), bucket(col("pair")))
      .localCheckpoint(true)
    // both 256-row bucket tables feed TWO consumers (their total agg
    // + the lr join) — checkpointed so the raw re-aggregate over the
    // pair stream and the en-slice re-tokenize run ONCE each (the
    // multi-consumer class; 256 rows of materialization buys back a
    // corpus-scale pass at any SF)
    val raw = pairs.groupBy("b").agg(count(lit(1)).as("c_r"))
      .localCheckpoint(true)
    val tgt = Dedup.adjacentPairs(docs.filter(col("lang") === "en"))
      .select(bucket(col("pair")))
      .groupBy("b").agg(count(lit(1)).as("c_t"))
      .localCheckpoint(true)
    val totals = raw.agg(coalesce(sum("c_r"), lit(0L)).as("rr"))
      .crossJoin(tgt.agg(coalesce(sum("c_t"), lit(0L)).as("tt")))
    val lr = s.range(B).toDF("b")
      .join(raw, Seq("b"), "left").join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("c_r", "c_t"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor((log(col("c_t") + 1) - log(col("tt") + B)
             - log(col("c_r") + 1) + log(col("rr") + B)) * 1e6)
          .cast("long").as("lr_micro"))
    pairs.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      .join(broadcast(lr), "b")
      .groupBy("doc_id")
      .agg(sum("cnt").cast("long").as("n_bigrams"),
           sum(col("cnt") * col("lr_micro")).cast("long").as("w_micro"))
  }
}
