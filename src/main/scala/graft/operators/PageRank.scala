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

  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
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
    // edge join consumes the left join's — ONE exchange per iteration
    // (contrib's groupBy), not three
    val nodes = checkpointPartitioned(eo.select(col("src").as("node"))
      .union(eo.select(col("dst"))).distinct()
      .repartition(col("node")))

    var mass = nodes.withColumn("mass", lit(1000L))
    (1 to iters).foreach { _ =>
      // (measured: a SHUFFLE_HASH hint on the mass side is ~25% SLOWER
      // here — the per-iteration hash build beats SMJ only when the
      // streamed side dwarfs the build side by more than these ~40x)
      val contrib = eo.join(mass, eo("src") === mass("node"))
        .select(col("dst"),
          // `div` = exact integer division (the `/` operator would detour
          // through doubles and risk half-ulp disagreements with DuckDB)
          expr("mass * 850 div (1000 * outdeg)").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      mass = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(150L) + coalesce(col("in_mass"), lit(0L))).as("mass"))
    }
    mass
  }
}
