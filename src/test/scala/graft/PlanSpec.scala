package graft

/** Physical-plan quality gates — the 100 TB design assertions.
  *
  * These don't check results (the DuckDB oracle does); they check that the
  * PLANS are the ones we'd want on a 1000-executor cluster: filters and
  * projections reach the parquet scan, dim joins broadcast, aggregates are
  * partial (map-side combine), and nothing in the catalog degenerates into
  * an unkeyed cartesian product.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("filters are pushed into the parquet scan (q02)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]")
      || p.contains("EqualTo(event_type,click)"), s"no pushed filter in:\n$p")
  }

  test("scans read only referenced columns (q02 projects 3 of 6)") {
    val p = plan("q02_filter_project")
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint") &&
      !p.contains("props"), "scan reads unprojected columns")
  }

  test("q06's IoU stays behind the overlap guard after predicate pushdown") {
    // the 6.2x-at-sf1 regression guard: Catalyst pushes the iou>0.1
    // filter into the join condition in arbitrary conjunct order; the
    // CASE WHEN guard must survive optimization so non-overlapping
    // pairs never pay the IoU arithmetic
    // a08 shares the pair space and gained the same guard in round 10
    // (sf10 46.8 -> 10.6 s); both join sites must keep it
    for (q <- Seq("q06_iou_join", "a08_gcn_layer")) {
      val p = plan(q)
      assert(p.contains("iou("), s"$q plan lost the iou expression:\n$p")
      // anchor per-line (a formatted plan renders each condition on one
      // line): EVERY iou( occurrence must sit inside a CASE WHEN on ITS
      // line — a global first-index compare would pass vacuously if an
      // unrelated CASE WHEN preceded an unguarded iou(). Per OCCURRENCE,
      // not per line: the k-th iou( on a line needs >= k "CASE WHEN"s
      // before it, else `CASE WHEN g THEN iou(..) END AND iou(..) > x`
      // (one guarded, one bare) would slip through a first-index check
      def starts(line: String, token: String): Seq[Int] =
        Iterator.iterate(line.indexOf(token))(i => line.indexOf(token, i + 1))
          .takeWhile(_ >= 0).toSeq
      p.linesIterator.filter(_.contains("iou(")).foreach { line =>
        val guards = starts(line, "CASE WHEN")
        starts(line, "iou(").zipWithIndex.foreach { case (pos, k) =>
          assert(guards.count(_ < pos) >= k + 1,
            s"$q: the ${k + 1}-th iou() on this line has no matching CASE WHEN guard before it:\n$line")
        }
      }
    }
  }

  test("dim-fact joins broadcast the dim side (q07)") {
    val p = plan("q07_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") || p.indexOf("BroadcastHashJoin") >= 0)
  }

  test("aggregations are partial before the shuffle (q01)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"no map-side combine:\n$p")
  }

  test("IoU theta-join stays keyed on frame — no cartesian product (q06)") {
    val p = plan("q06_iou_join")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
  }

  test("whole-stage codegen covers the bbox arithmetic (q04)") {
    // AQE only materializes codegen spans in the final plan — execute first
    val df = SparkEntry.queries("q04_bbox_clip")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), s"no codegen span:\n$p")
  }

  test("fuzzy-match pairs the aggregated name matrix, not raw rows (d05)") {
    // the Levenshtein join must sit ABOVE the (brand, name) aggregation —
    // a join over raw part rows would re-open the row-level pair space
    val df = SparkEntry.queries("d05_fuzzy_match")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val joinAt = p.indexOf("Join")
    assert(joinAt >= 0, s"no join in:\n$p")
    assert(p.indexOf("HashAggregate", joinAt) >= 0,
      s"join does not read aggregated inputs:\n$p")
  }

  test("as-of join is the union+window form — no join node, one hash shuffle (q28)") {
    val p = plan("q28_asof_join")
    assert(!p.contains("Join"), s"asofJoin planned a join:\n$p")
    // exactly the window's hash exchange plus the presentation sort's
    // range exchange — a third shuffle means the union or filter broke
    // the single-pass shape
    val n = "Exchange ".r.findAllIn(p).length
    assert(n <= 2, s"expected <=2 exchanges, got $n:\n$p")
  }

  test("cohort query prunes the events scan to its two columns (q35)") {
    val p = plan("q35_cohort_retention")
    // column pruning must survive the withTsNanos normalization projection:
    // the scan reads exactly (ts, user_id), whatever ts's physical type
    assert(p.contains("struct<ts:timestamp_ntz,user_id:bigint>")
        || p.contains("struct<ts:bigint,user_id:bigint>"),
      s"events scan reads more than (ts, user_id):\n$p")
  }

  test("KMV sketch aggregates map-side — k hashes per group on the shuffle (t18)") {
    val p = plan("t18_kmv_distinct")
    assert(p.contains("partial_"), s"no partial sketch aggregation:\n$p")
  }

  test("bloom probe filters the fact side BELOW the join (q37)") {
    val p = plan("q37_bloom_join")
    // the getbit membership test must sit under the fact scan stage, i.e.
    // appear in the plan before (deeper than) the join node consuming it
    assert(p.contains("getbit"), s"no bloom membership filter in plan:\n$p")
    val joinAt = p.indexOf("Join")
    val probeAt = p.indexOf("getbit")
    assert(joinAt >= 0 && probeAt > joinAt,
      "bloom probe should be below the join in the printed tree")
    // and the (filtered) dim side stays broadcast
    assert(p.contains("BroadcastHashJoin"), s"dim side not broadcast:\n$p")
  }

  test("CMS bucket tables broadcast into the estimate join (t20)") {
    val p = plan("t20_cms_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), s"sketch join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("pagerank iterations reuse the checkpointed edge partitioning (q40)") {
    val p = plan("q40_pagerank")
    // the static edge side is scanned from the checkpoint, not re-planned
    // from parquet: exactly one events/lineitem file scan would be wrong —
    // there must be ZERO (all inputs come from checkpointed RDDs)
    assert(!p.contains("FileScan parquet"),
      s"iteration plan re-reads parquet instead of the checkpoint:\n$p")
    // ONE hash exchange per iteration (contrib's groupBy): the edge join
    // and the mass left-join consume the AQE-off-captured checkpoint
    // partitionings (PageRank.checkpointPartitioned — a plain AQE-on
    // localCheckpoint loses them and re-shuffles the static node list
    // every iteration: 10 exchanges instead of these 5, the r10 find)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 5,
      s"expected 5 per-iteration exchanges, found $exchanges:\n$p")
  }

  test("corpus-prep composite keeps its shuffle budget (d10)") {
    // d10 chains dedup -> quality -> sampling over documents; the whole
    // composite needs exactly 3 hash exchanges (fingerprint group, the
    // cluster-representative join's hash side, final stratum group) and
    // 2 document scans, with the tiny cluster map broadcast. A regression
    // that re-shuffles the corpus between stages (e.g. losing the reused
    // partitioning) shows up here before it shows up at scale.
    val p = plan("d10_corpus_prep")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 3, s"d10 gained hash exchanges ($hashEx > 3):\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"d10 re-reads the corpus ($scans scans > 2):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cluster map not broadcast:\n$p")
  }

  test("dup-span index keeps its shuffle budget (d16)") {
    // d16 is two linear passes over the token stream: ONE gram-keyed
    // aggregate finds cross-doc grams (the min!=max rewrite — a
    // countDistinct regression would add a second gram exchange), one
    // semi-join keeps hits, one doc-keyed exchange feeds the island
    // windows, one (doc, island) exchange the span groupBy. Budget: 4
    // hash exchanges, 2 corpus scans, and no sort-merge path for the
    // dup-gram side at this SF (broadcast semi-join).
    val p = plan("d16_dup_spans")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 4, s"d16 gained hash exchanges ($hashEx > 4):\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"d16 re-reads the corpus ($scans scans > 2):\n$p")
  }

  test("span scrub keeps its shuffle budget (d17)") {
    // d17 = d16's span table + the removal join. The dup-gram aggregate
    // and hit join run EXCHANGE-FREE off the (h1,h2)-checkpointed gram
    // layout, the island windows / span groupBys share one doc_id
    // exchange, and the scrub join's span side is collected per doc and
    // broadcast at this SF. Budget: 2 hash exchanges (doc_id for the
    // islands; headroom for the scrub join going shuffle at scale) and
    // ONE corpus scan (the gram stream is materialized).
    val p = plan("d17_span_scrub")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 2, s"d17 gained hash exchanges ($hashEx > 2):\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"d17 re-reads the corpus ($scans scans > 1):\n$p")
  }

  test("CCNet bucketing keeps its shuffle budget and broadcast LM joins (t28)") {
    // ONE checkpointed tokenize; the LM tables (bigram/unigram/vocab
    // aggregates) each cost one hash exchange and then BROADCAST into
    // the scoring joins at this SF; the per-doc aggregate and the
    // per-lang tertile window add one each. Budget: 5 hash exchanges,
    // 3 broadcast joins, no corpus re-scan. A regression that shuffles
    // the 25M-row (sf10) bigram stream per LM join would show here.
    val p = plan("t28_ccnet_bucket")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 5, s"t28 gained hash exchanges ($hashEx > 5):\n$p")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"t28 LM joins not broadcast ($bhj < 3):\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"t28 re-reads the corpus ($scans scans > 1):\n$p")
  }

  test("no catalog query degenerates into an unkeyed cartesian product") {
    // intentional broadcast-nested-loop joins over provably tiny sides:
    // a06 (3-row prefix dim), n05 (<=64 Pareto candidates, group-less
    // dominance is inherently theta — the grouped form is q10 and hashes),
    // n08 (ONE-row broadcast of the global ||X|| normalization scalar),
    // t21 (≤64-cell histogram sketch × 3 quantile literals — the theta
    // join runs over the SKETCH, never the data),
    // (the whole IVF family — e06/e09/e12/e19 — lost its recallFloor
    // exemptions in r14 when the gates became ranked-row full-replay
    // oracles: each fn is now the production probe itself, checked
    // clean below with NO exemption; the recallFloor helper is gone),
    // t24 (ONE-row HLL estimate × ONE-row exact count),
    // t26 (ONE-row broadcast of the global N/avgdl scalar),
    // t27/n31 (ONE-row rr/tt totals × the 256-row bucket feature table —
    // the DSIR log-ratio constants, never data-sized; n31 is t27's
    // streaming leg and assembles the same lr table),
    // e17 (the bounded-contract anchor set — 50 rows broadcast against
    // the streaming corpus scan, the e01 query-side shape: the BNLJ is
    // exactly "each corpus row scored against every anchor", which is
    // the operator's defined work; nothing data × data)
    val exempt = Set("a06_containment_join", "n05_placement_pareto",
      "n08_forecast_trainset", "t21_hist_quantiles",
      "t24_hll_distinct", "t26_bm25", "t27_dsir_weights", "n31_stream_dsir",
      "e17_contrastive_pairs")
    SparkEntry.catalog.filterNot(q => exempt(q.name)).foreach { q =>
      val p = q.fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} plans a BroadcastNestedLoopJoin")
    }
    // the bench-only plan overrides (production probe paths) drop the
    // recallFloor summary join, so they must be clean WITHOUT exemption
    SparkEntry.catalog.flatMap(q => q.benchFn.map(q.name -> _)).foreach {
      case (name, fn) =>
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          s"$name benchFn plans a CartesianProduct")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name benchFn plans a BroadcastNestedLoopJoin")
    }
  }
}
