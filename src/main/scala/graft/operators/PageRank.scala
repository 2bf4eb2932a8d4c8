package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank with integer milli-mass — distributed graph
  * analytics in the same family as d04's connected components, but with a
  * numeric fixpoint instead of a label fixpoint.
  *
  * All arithmetic is integral (initial mass 1000 per node; each iteration
  * a node keeps a base of 150‰ and every out-edge carries
  * `mass * 850 / (1000 * outdeg)` with ONE truncating division), so the
  * result is bit-identical regardless of partitioning, core count, or
  * engine — a recursive-CTE oracle can replay it exactly. The float
  * version of PageRank is notoriously non-associative under re-ordered
  * sums; the integer formulation is the cross-engine-stable variant
  * (same trick as t17's integer fluency and a08's quantized GCN
  * messages).
  *
  * Scale shape: `edges` is shuffled ONCE onto `src` and reused by every
  * iteration's join (the masses side is the small/varying one); each
  * iteration is join → map-side-combinable sum → broadcast-joinable base
  * union. Iteration count is fixed (power iteration, not convergence
  * polling), so there is no driver-side convergence collect. Lineage grows
  * linearly with `iters`; callers doing 50+ rounds should localCheckpoint
  * every ~8 (the d04 pattern) — at the catalog's 5 rounds it is cheaper
  * not to.
  */
object PageRank {

  /** Run `iters` integer power iterations over a directed edge list
    * (`srcCol`, `dstCol`). Returns (node, mass_milli).
    */
  // partitioning-preserving checkpoint (the r10 AQE find) — shared
  private def checkpointPartitioned(df: DataFrame): DataFrame =
    graft.ops.Checkpoints.partitioned(df)

  /** Run `iters` integer power iterations. `everyNodeReceives = true`
    * asserts that every node has at least one IN-edge (true for any
    * symmetrized edge list, q40's construction): then each iteration's
    * contribution aggregate already covers every node, the per-iteration
    * nodes LEFT JOIN is the identity, and the whole nodes table (plus
    * its checkpoint job and one scan per iteration) drops out of the
    * plan. Results are bit-identical (PageRankSpec pins both forms
    * against each other); the oracle keeps the LEFT JOIN formulation, so
    * the equivalence is itself cross-checked at every gated SF.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
          everyNodeReceives: Boolean = false): DataFrame = {
    // ONE materialization of the edge table: the degree self-join reads
    // the distinct edge shuffle twice inside a single plan, which
    // Catalyst's ReuseExchange serves from one shuffle write — so only
    // the joined result needs a checkpoint, and `nodes` derives from the
    // checkpoint instead of re-running the distinct
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eo = checkpointPartitioned(e.join(outdeg, "src")
      .repartition(col("src"))) // edges are iterated 5x: cut the double-scan lineage
    // nodes partitioned on the key every per-iteration join uses: the
    // left join then consumes contrib's agg partitioning directly and the
    // edge join consumes the left join's — the contrib groupBy is the
    // only per-iteration exchange. Skipped entirely under
    // everyNodeReceives (m0 derives from eo's src side: src set == node
    // set when every node receives, since every receiver also sends on
    // a symmetrized list).
    lazy val nodes = checkpointPartitioned(eo.select(col("src").as("node"))
      .union(eo.select(col("dst"))).distinct()
      .repartition(col("node")))

    var mass =
      if (everyNodeReceives)
        eo.select(col("src").as("node")).distinct().withColumn("mass", lit(1000L))
      else nodes.withColumn("mass", lit(1000L))
    (1 to iters).foreach { _ =>
      // SHUFFLE_HASH on the mass side (r17, re-measured — see
      // OPTIMIZATION_r17.md): eo is hash-partitioned on src and mass
      // arrives hash-partitioned on node from the previous aggregate,
      // so the shuffled-hash join is EXCHANGE-FREE — it builds a
      // per-partition hash of the (small) mass side and streams eo with
      // NO per-iteration sort of the edge table and NO per-iteration
      // broadcast build. The pre-r17 plan let the static planner
      // broadcast the EDGE side under the 64 MB threshold: five
      // separate 1.18M-row broadcast collects+builds per run (the
      // stages probe's top cost). The hash build is per-partition
      // mass/32 rows locally and scales out with partitions at 100 TB,
      // where a broadcast of either side would not fit.
      val contrib = eo.join(mass.hint("shuffle_hash"), eo("src") === mass("node"))
        .select(col("dst"),
          // `div` = exact integer division (the `/` operator would detour
          // through doubles and risk half-ulp disagreements with DuckDB)
          expr("mass * 850 div (1000 * outdeg)").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      mass =
        if (everyNodeReceives)
          contrib.select(col("dst").as("node"),
            (lit(150L) + col("in_mass")).as("mass"))
        else nodes
          .join(contrib, nodes("node") === contrib("dst"), "left")
          .select(col("node"),
            (lit(150L) + coalesce(col("in_mass"), lit(0L))).as("mass"))
    }
    mass
  }
}
