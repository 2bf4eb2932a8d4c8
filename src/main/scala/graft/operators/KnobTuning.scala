package graft.operators

import graft.ops.TaskSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline knob-tuning operators (reference: knob_tuner.py,
  * placement_optimizer.py; SURVEY §2.6 D2/D3, §2.9 X4/X5, §4.3).
  *
  * The RL placement search is deliberately re-designed (§4.3): same output
  * contract — a Pareto set of (runtime, cost, placement) candidates per
  * config — produced by deterministic candidate enumeration evaluated by
  * the X1 simulator, thousands of candidates in parallel on executors.
  */
object KnobTuning {

  /** D2/D3: generic Pareto dominance filter — keep rows not dominated on
    * (cost low, quality high) within their group. The group key keeps the
    * quadratic comparison per-group; the anti-join is the NOT EXISTS
    * formulation Catalyst executes without a cross product of the whole
    * table.
    */
  def paretoFilter(df: DataFrame, group: Seq[String], cost: String, quality: String): DataFrame = {
    val o = df.alias("o"); val c = df.alias("c")
    val groupEq = group.map(g => col(s"o.$g") === col(s"c.$g"))
      .foldLeft(lit(true))(_ && _)
    c.join(o,
        groupEq &&
          col(s"o.$cost") <= col(s"c.$cost") && col(s"o.$quality") >= col(s"c.$quality") &&
          (col(s"o.$cost") < col(s"c.$cost") || col(s"o.$quality") > col(s"c.$quality")),
        "left_anti")
  }

  /** Deterministic placement-candidate generator: for an n-task graph,
    * prefix-cloud masks, suffix-cloud masks, stride patterns, and
    * hash-scattered masks — a diverse cover of the placement space without
    * RL (the paper itself filters to a small candidate set, supp. A).
    */
  def placementCandidates(n: Int, count: Int): Seq[(Int, Array[Int])] = {
    val patterns = Seq.newBuilder[Array[Int]]
    patterns += Array.fill(n)(0) // all on-prem
    val steps = math.max(1, n / math.max(1, count / 4))
    for (k <- steps to n by steps) {
      patterns += Array.tabulate(n)(i => if (i < k) 1 else 0) // prefix cloud
      patterns += Array.tabulate(n)(i => if (i >= n - k) 1 else 0) // suffix cloud
    }
    for (stride <- Seq(2, 3, 4, 5)) patterns += Array.tabulate(n)(i => if (i % stride == 0) 1 else 0)
    for (seed <- 1 to math.max(0, count - patterns.result().length)) // hash scatter
      patterns += Array.tabulate(n)(i => (((i * 2654435761L + seed * 40503L) >>> 16) & 1L).toInt)
    patterns.result().distinct.take(count).zipWithIndex.map { case (p, i) => (i, p) }
  }

  /** X1+X5: evaluate candidate placements for a graph on executors and
    * Pareto-filter (runtime, cost). Returns
    * (cand_id, runtime, cost, placement).
    */
  def placementSearch(
      graph: TaskSim.Graph,
      cores: Int,
      numCandidates: Int): DataFrame = {

    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val candidates = placementCandidates(graph.tasks.length, numCandidates)
    val evaluated = candidates.toDS()
      .map { case (candId, placement) =>
        val g = graph.copy(tasks = graph.tasks.zipWithIndex.map { case (t, i) =>
          t.copy(placement = placement(i))
        })
        (candId, g.simulateRt(cores), g.simulateCost, placement.toSeq)
      }
      .toDF("cand_id", "runtime", "cost", "placement")
    // minimize BOTH runtime and cost: paretoFilter's quality axis is
    // higher-is-better, so feed it the negated cost
    paretoFilter(evaluated.withColumn("neg_cost", -col("cost")),
        Seq.empty, "runtime", "neg_cost")
      .select(col("c.cand_id").as("cand_id"), col("c.runtime").as("runtime"),
        col("c.cost").as("cost"), col("c.placement").as("placement"))
  }

  /** A8/X4 second half: eta calibration + per-starting-point election
    * (knob_tuner.py:344-361). Per video: eta_fac = Σacc/Σcost over that
    * video's samples; etas = linspace(eta_fac·minEta, eta_fac·maxEta,
    * numEtas); sample idx scores with eta[floor(idx·numEtas/n)] as
    * score = acc − eta·cost, and each consecutive group of
    * `samplesPerStart` samples elects its best-scoring sample (first-best
    * on ties, i.e. lowest idx) as a hill-climb starting point.
    *
    * Everything is windowed/grouped by the video key — per-video sums are
    * partition-local aggregates, so the election scales with the number
    * of videos, the corpus' natural parallel axis.
    */
  def etaElection(samples: DataFrame, vid: String, idx: String,
                  acc: String, cost: String, samplesPerStart: Int,
                  numEtas: Int = 10, minEta: Double = 0.1,
                  maxEta: Double = 10.0): DataFrame = {
    require(numEtas >= 2, s"linspace needs numEtas >= 2, got $numEtas")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(vid)
    val etaFac = sum(col(acc)).over(w) / sum(col(cost)).over(w)
    val n = count(lit(1)).over(w)
    val etaIdx = floor(col(idx) * numEtas / n)
    val eta = etaFac * minEta + etaIdx * (etaFac * maxEta - etaFac * minEta) / (numEtas - 1)
    samples
      .withColumn("eta", eta)
      .withColumn("score", col(acc) - col("eta") * col(cost))
      .withColumn("start_id", floor(col(idx) / samplesPerStart))
      .groupBy(col(vid), col("start_id"))
      .agg(
        max_by(struct(col(idx).as("best_idx"), col("eta"), col("score")),
          struct(col("score"), -col(idx))).as("best"))
      .select(col(vid), col("start_id"),
        col("best.best_idx").as("best_idx"), col("best.eta").as("eta"),
        col("best.score").as("score"))
  }

  /** X4: hill climbing over integer knob domains. `evaluate` scores a
    * batch of configs in ONE Spark pass (the reference memoizes
    * (config, video) evals; here the per-round frontier is evaluated
    * together). Deterministic: fixed seeds, first-best tie-breaks.
    */
  def hillClimb(
      domains: Seq[Seq[Int]],
      evaluate: Seq[Seq[Int]] => Map[Seq[Int], Double],
      starts: Seq[Seq[Int]],
      maxIter: Int = 10): (Seq[Int], Double, Int) = {

    val cache = scala.collection.mutable.Map.empty[Seq[Int], Double]
    var evals = 0
    def evalBatch(configs: Seq[Seq[Int]]): Unit = {
      val missing = configs.distinct.filterNot(cache.contains)
      if (missing.nonEmpty) {
        evals += missing.length
        cache ++= evaluate(missing)
      }
    }

    def neighbors(c: Seq[Int]): Seq[Seq[Int]] =
      c.indices.flatMap { i =>
        val dom = domains(i)
        val pos = dom.indexOf(c(i))
        Seq(pos - 1, pos + 1).filter(p => p >= 0 && p < dom.length)
          .map(p => c.updated(i, dom(p)))
      }

    evalBatch(starts)
    var best = starts.maxBy(c => (cache(c), -starts.indexOf(c).toDouble))
    var improved = true
    var iter = 0
    while (improved && iter < maxIter) {
      improved = false
      val ns = neighbors(best)
      evalBatch(ns)
      val cand = (best +: ns).maxBy(cache)
      if (cache(cand) > cache(best)) { best = cand; improved = true }
      iter += 1
    }
    (best, cache(best), evals)
  }
}
