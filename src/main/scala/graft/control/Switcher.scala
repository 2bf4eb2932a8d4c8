package graft.control

/** One profiled (knob config, placement) operating point
  * (reference: prof.json arrays, consumed at knob_switcher.py:27-57).
  */
final case class Profile(
    placementId: Int,
    knobConfig: Int,
    runtime: Double,
    cloudCost: Double,
    sizeBytes: Double)

/** Per-chunk knob switcher (reference: knob_switcher.py:79-116, paper
  * Algorithm 1): every `planningInterval` chunks re-plan via the LP; per
  * chunk categorize content by nearest center, pick the config with max
  * plan-vs-used drift, then scan the category's priority list for the first
  * placement the buffer admits.
  *
  * Sequential per stream (the reference's own switcher↔UDF dependency,
  * supp. N.2); scale comes from running one instance per stream key inside
  * flatMapGroups[WithState].
  */
final class Switcher(
    categories: Array[Array[Double]], // [category][config] quality centers
    profiles: IndexedSeq[Profile],
    planner: KnobPlanner,
    planningInterval: Int,
    budget: Double,
    bootstrapHistogram: Array[Double],
    buffer: SimBuffer) extends Serializable {

  private val numCategories = categories.length
  private val numConfigs = categories(0).length

  // priority lists: per category, configs desc by quality; within a config,
  // placements asc by (cloudCost, placementId, runtime) — the reference's
  // tuple sort (knob_switcher.py:36-51)
  private val configPrio: Array[IndexedSeq[Profile]] =
    categories.map { qualRow =>
      val configOrder = qualRow.zipWithIndex.sortBy { case (q, i) => (-q, i) }.map(_._2)
      configOrder.toIndexedSeq.flatMap { c =>
        profiles.filter(_.knobConfig == c)
          .sortBy(p => (p.cloudCost, p.placementId, p.runtime))
      }
    }

  // on-prem runtime per config (knob_switcher.py:54-57)
  val knobCost: Array[Double] = {
    val kc = new Array[Double](numConfigs)
    profiles.filter(_.cloudCost == 0).foreach(p => kc(p.knobConfig) = p.runtime)
    kc
  }

  private var curKnob = 0
  private var categoryCounter: Array[Double] = bootstrapHistogram.clone()
  private var usedConfigsCounter: Array[Array[Double]] = Array.fill(numCategories, numConfigs)(1.0)
  private var planM: Array[Array[Double]] = _
  private var counter = 0

  private def argmin(xs: Array[Double]): Int = xs.indexOf(xs.min)
  private def argmax(xs: Array[Double]): Int = xs.indexOf(xs.max)

  /** Decision for one 2 s chunk given the previous chunk's quality score.
    * Returns (config, placementId, cloudCost, runtime).
    */
  def switch(curScore: Double): (Int, Int, Double, Double) = {
    if (counter % planningInterval == 0) {
      val histogram = {
        val s = categoryCounter.sum
        categoryCounter.map(_ / s)
      }
      planM = planner.plan(histogram, budget)._1
      categoryCounter = Array.fill(numCategories)(0.0)
      usedConfigsCounter = Array.fill(numCategories, numConfigs)(1.0)
      buffer.computedPlan()
    }

    // nearest content category on the current knob's quality axis
    val dynamics = argmin(categories.map(row => math.abs(row(curKnob) - curScore)))

    // preferred config: max plan-vs-used drift
    val usedSum = usedConfigsCounter(dynamics).sum
    val ratioError = Array.tabulate(numConfigs)(j =>
      planM(dynamics)(j) - usedConfigsCounter(dynamics)(j) / usedSum)
    val knobPlace = argmax(ratioError)

    // scan priority list: start at the planned config, advance until the
    // buffer admits the runtime (knob_switcher.py:95-102)
    val prio = configPrio(dynamics)
    var idx = prio.indexWhere(_.knobConfig == knobPlace)
    while (!buffer.fits(prio(idx).runtime)) idx += 1

    val chosen = prio(idx)
    curKnob = chosen.knobConfig
    categoryCounter(dynamics) += 1
    usedConfigsCounter(dynamics)(curKnob) += 1
    buffer.update(curKnob, chosen.runtime)
    counter += 1

    (chosen.knobConfig, chosen.placementId, chosen.cloudCost, chosen.runtime)
  }

  /** Flat snapshot of the MUTABLE state only — the static config
    * (profiles, categories, planner, priority lists) is rebuilt by the
    * caller's `mkSwitcher()` factory, so the streaming state row carries
    * just counters + plan matrix + buffer queue (product-encodable, no
    * kryo). [[restore]] into a freshly built Switcher is exact.
    */
  def snapshot: Switcher.Snapshot = {
    val (bs, bt) = buffer.snapshot
    Switcher.Snapshot(curKnob, counter, categoryCounter.toSeq,
      usedConfigsCounter.map(_.toSeq).toSeq,
      Option(planM).map(_.map(_.toSeq).toSeq), bs, bt)
  }

  /** Load a snapshot into this (freshly constructed) instance. */
  def restore(s: Switcher.Snapshot): Unit = {
    curKnob = s.curKnob
    counter = s.counter
    categoryCounter = s.categoryCounter.toArray
    usedConfigsCounter = s.usedConfigsCounter.map(_.toArray).toArray
    planM = s.planM.map(_.map(_.toArray).toArray).orNull
    buffer.restore(s.bufferSizes, s.bufferTimes)
  }
}

object Switcher {
  /** The switcher's mutable state, flattened for the product encoder. */
  final case class Snapshot(curKnob: Int, counter: Int,
                            categoryCounter: Seq[Double],
                            usedConfigsCounter: Seq[Seq[Double]],
                            planM: Option[Seq[Seq[Double]]],
                            bufferSizes: Seq[Double], bufferTimes: Seq[Double])
}

/** Chunk-level replay of the online phase (reference: simulate.py).
  * Pure sequential functions — the Spark layer runs one replay per stream
  * key via flatMapGroups (see ControlQueries) or structured streaming.
  */
object Replay {

  /** One decision-log row (simulate.py:24 header). */
  final case class LogRow(
      chunkId: Long, chosenConfig: Int, chosenPlacement: Int,
      cloudCost: Double, runtimeS: Double, score: Double)

  /** Skyscraper replay over (chunkId, per-config scores) rows; returns the
    * decision log (chunk 0 is emitted as-is with config 0, as the
    * reference does — simulate.py:27-31).
    */
  def skyscraper(chunks: Iterator[(Long, Array[Double])], switcher: Switcher): Iterator[LogRow] = {
    var curScore = 0.0
    var first = true
    chunks.map { case (chunkId, scores) =>
      if (first) {
        first = false
        curScore = scores(0)
        LogRow(chunkId, 0, 0, 0.0, 0.0, curScore)
      } else {
        val (config, placement, cost, rt) = switcher.switch(curScore)
        curScore = scores(config)
        LogRow(chunkId, config, placement, cost, rt, curScore)
      }
    }
  }

  /** Static-baseline replay (simulate.py:49-89): fixed config, constant
    * runtime from the on-prem profile.
    */
  def static(chunks: Iterator[(Long, Array[Double])], config: Int, knobRt: Double): Iterator[LogRow] =
    chunks.map { case (chunkId, scores) =>
      LogRow(chunkId, config, 0, 0.0, knobRt, scores(config))
    }
}
