package graft.control

import graft.ops.Simplex

/** Content-mixture forecasting seam. The reference uses a Keras MLP over
  * 96 h of (knob, score) history (knob_plan.py:313-317); the rebuild makes
  * the forecaster pluggable — the planner only needs a category
  * distribution.
  */
trait Forecaster extends Serializable {
  def forecast(input: Array[Double]): Array[Double]
}

/** Pass-through: use the observed histogram as the forecast mixture. */
object HistogramForecaster extends Forecaster {
  def forecast(input: Array[Double]): Array[Double] = {
    val s = input.sum
    if (s <= 0) Array.fill(input.length)(1.0 / input.length) else input.map(_ / s)
  }
}

/** Knob planner: forecast the content mixture, then assign per-category
  * knob-usage ratios via a linear program (reference:
  * knob_plan.py:72-133, paper §4.1 Eq. 2-4).
  *
  * Decision variables x[i·P + j] = fraction of category-i time spent in
  * placement/config j. Constraints: each category's ratios sum to exactly 1
  * (two inequality rows), total expected cost ≤ budget, 0 ≤ x ≤ 1.
  * Objective: maximize mixture-weighted expected quality over the planning
  * horizon.
  *
  * Runs on the driver — the LP is ≤ a few hundred variables (paper Fig.
  * 13); the *data* scale lives in the histogram aggregation feeding it.
  */
final class KnobPlanner(
    categories: Array[Array[Double]], // [category][config] quality centers
    knobCost: Array[Double],          // per-config cost (runtime) per interval
    hoursPlanAhead: Double,
    timeInterval: Double,
    forecaster: Forecaster = HistogramForecaster) extends Serializable {

  private val numCluster = categories.length
  private val numPlace = knobCost.length

  /** Returns (plan[category][config] usage ratios, expected score). */
  def plan(input: Array[Double], budget: Double): (Array[Array[Double]], Double) = {
    val mixture = forecaster.forecast(input)
    assignKnobsLinProg(mixture, budget)
  }

  def assignKnobsLinProg(mixture: Array[Double], budget: Double): (Array[Array[Double]], Double) = {
    val nVar = numCluster * numPlace
    val nRows = 2 * numCluster + 1 + nVar // ratio rows + budget + x<=1 bounds
    val a = Array.ofDim[Double](nRows, nVar)
    val b = new Array[Double](nRows)
    val c = new Array[Double](nVar)

    // per-category ratios sum to 1 (<= 1 and >= 1 as a pair of <= rows)
    for (i <- 0 until numCluster) {
      for (j <- i * numPlace until (i + 1) * numPlace) {
        a(2 * i)(j) = 1.0
        a(2 * i + 1)(j) = -1.0
      }
      b(2 * i) = 1.0
      b(2 * i + 1) = -1.0
    }

    // expected cost <= budget
    for (i <- 0 until numCluster; j <- 0 until numPlace)
      a(2 * numCluster)(i * numPlace + j) = mixture(i) * knobCost(j) * hoursPlanAhead * 3600
    b(2 * numCluster) = budget

    // bounds x_j <= 1 (linprog's bounds=(0,1))
    for (j <- 0 until nVar) {
      a(2 * numCluster + 1 + j)(j) = 1.0
      b(2 * numCluster + 1 + j) = 1.0
    }

    // maximize mixture-weighted quality == minimize negative
    for (i <- 0 until numCluster; j <- 0 until numPlace)
      c(i * numPlace + j) = -mixture(i) * categories(i)(j) * hoursPlanAhead * 3600 / timeInterval

    val res = Simplex.minimize(c, a, b)
    val planM = Array.tabulate(numCluster, numPlace)((i, j) => res.x(i * numPlace + j))
    (planM, -res.objective)
  }

  /** X3: greedy knapsack fallback (knob_plan.py:135-177 — the reference
    * raises NotImplementedError over a dead sketch; paper supp. B).
    * INTEGRAL assignment: each category runs exactly one config. Start
    * every category on the cheapest config, then repeatedly take the
    * affordable upgrade with the best quality-gain-per-extra-cost ratio
    * (free upgrades first), re-basing that category's remaining upgrade
    * costs — the reference's heap-adjustment step. Same (plan, score)
    * contract as the LP; the LP relaxation always scores ≥ this integral
    * plan (asserted in KnobPlannerSpec).
    */
  def assignKnobsKnapsack(mixture: Array[Double], budget: Double): (Array[Array[Double]], Double) = {
    val horizon = hoursPlanAhead * 3600
    def costOf(i: Int, j: Int) = mixture(i) * knobCost(j) * horizon
    def qualOf(i: Int, j: Int) = mixture(i) * categories(i)(j) * horizon / timeInterval
    val base = knobCost.indices.minBy(j => (knobCost(j), j))
    val assign = Array.fill(numCluster)(base)
    var remaining = budget - (0 until numCluster).map(i => costOf(i, base)).sum
    // same contract as the LP sibling: a budget that cannot even cover
    // the cheapest-config-everywhere baseline is an error, not a silent
    // over-budget plan
    require(remaining >= 0,
      s"knapsack infeasible: budget $budget below baseline cost ${budget - remaining}")
    var improved = true
    while (improved) {
      improved = false
      val candidates = for {
        i <- 0 until numCluster
        j <- 0 until numPlace
        if categories(i)(j) > categories(i)(assign(i))
        dc = costOf(i, j) - costOf(i, assign(i))
        if dc <= remaining
        dq = qualOf(i, j) - qualOf(i, assign(i))
      } yield (i, j, dc, dq)
      if (candidates.nonEmpty) {
        // free/negative-cost upgrades are infinitely efficient; otherwise
        // highest gain per extra cost, deterministic (i, j) tie-break
        val (i, j, dc, _) = candidates.maxBy { case (i, j, dc, dq) =>
          (if (dc <= 0) Double.MaxValue else dq / dc, -i.toDouble, -j.toDouble)
        }
        assign(i) = j
        remaining -= dc
        improved = true
      }
    }
    val planM = Array.tabulate(numCluster, numPlace)((i, j) => if (assign(i) == j) 1.0 else 0.0)
    (planM, (0 until numCluster).map(i => qualOf(i, assign(i))).sum)
  }
}
