package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the tokenizer-training loop a
  * large-scale corpus pipeline runs before any token counting is
  * meaningful (Sennrich'16). Extends t16's single-pass pair statistics
  * (`Dedup.adjacentPairs`) into the full iterative algorithm.
  *
  * Scale shape (the d05 lesson): the corpus is reduced ONCE to the
  * distinct-word frequency matrix (one corpus-scale shuffle); every merge
  * iteration then runs on that cardinality-bound table — explode adjacent
  * symbol pairs, weight by word frequency, pick the global argmax — so 10
  * merges cost 10 tiny jobs, not 10 corpus scans. At 100 TB the word
  * matrix is millions of rows where the corpus is trillions of tokens.
  * Only the chosen (pair, count) row ever reaches the driver.
  *
  * Determinism: counts are integral; ties break on the lexicographically
  * smallest pair — partition-count invariant by construction (spec-checked
  * vs a single-threaded reference implementation).
  */
object BpeLearner {

  /** Greedy left-to-right non-overlapping merge of adjacent (a,b) runs —
    * standard BPE application order.
    */
  private[operators] def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Single-threaded reference for the spec: learn merges from a
    * (word -> freq) map.
    */
  private[operators] def learnLocal(words: Map[String, Long], steps: Int): Seq[(String, String, Long)] = {
    var tbl = words.toSeq.map { case (w, f) => (w.map(_.toString): Seq[String], f) }
    (1 to steps).flatMap { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts.update((p(0), p(1)), counts.getOrElse((p(0), p(1)), 0L) + f)
        }
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        tbl = tbl.map { case (syms, f) => (mergePair(syms, a, b), f) }
        Some((a, b, n))
      }
    }
  }

  /** BPE ENCODE as pure string expressions: a word rendered in bracketed
    * form (`{c}{h}{a}{r}{s}`) walks the merge table as one
    * `replace('{a}{b}' → '{ab}')` per merge — `replace`'s left-to-right
    * non-overlapping scan equals BPE's greedy application order
    * (spec-checked against [[mergePair]]). Every symbol carries BOTH its
    * own delimiters, so adjacent matches share no characters (unlike a
    * single-separator form) and `{b}{a}` can never match a neighbor that
    * merely STARTS with `a` (the `{b}{aa}` prefix trap). Codegen'd, no
    * UDF; intended to run over the distinct-word matrix, not raw
    * occurrences (the t19/d05 cardinality collapse).
    */
  def encodeExpr(word: org.apache.spark.sql.Column,
                 merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(regexp_replace(word, "(.)", "{$1}")) { case (c, (a, b)) =>
      org.apache.spark.sql.functions.replace(c, lit("{" + a + "}{" + b + "}"), lit("{" + a + b + "}"))
    }

  /** Token count of a bracketed encoding = number of `{` markers. */
  def encodedTokenCount(sym: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    length(sym) - length(org.apache.spark.sql.functions.replace(sym, lit("{"), lit("")))

  /** Single-threaded reference encoder for the spec. */
  private[operators] def encodeLocal(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Dataset.unpersist on a localCheckpoint'd frame is a cacheManager
    * no-op — the checkpoint BLOCKS are only freed when the underlying
    * RDD is GC'd (ADVICE r17). Reach the checkpointed RDD through the
    * LogicalRDD node the checkpoint returned and unpersist it directly,
    * so each loop round's retired matrix releases its blocks eagerly
    * instead of waiting for a session reset.
    */
  private def freeCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Learn `steps` BPE merges over the word-frequency matrix of `docs`.
    * Returns one row per merge: (step, left, right, pair_count).
    */
  def learnMerges(docs: DataFrame, steps: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // ONE corpus-scale pass: distinct words + frequencies (map-side
    // partial agg), seeded with per-character symbol arrays
    val seed = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .toDF("syms", "freq")
      .cache()
    val nWords = seed.count() // materialize before the loop
    // size the LOOP's partitioning to the matrix, not the session (r17):
    // the typed map defeats AQE and a cached plan keeps its shuffle
    // partitioning, so the 12-round loop otherwise runs ~38 stages of 32
    // near-empty tasks over a matrix of a few thousand rows (the stages
    // probe charged t19 27 exec-seconds of which the real pair-count
    // work is well under 1 s). ~64k sym-array rows per partition keeps a
    // 100 TB-scale matrix (millions of distinct words) spread while a
    // toy-SF matrix iterates in one task. Results are partition-count
    // invariant by construction (BpeSpec).
    val loopParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, (nWords + 65535L) / 65536L)).toInt
    var words = seed.repartition(loopParts).localCheckpoint(true)
    seed.unpersist()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var lastMaterialized = words // the cached seed matrix
    var step = 1
    var done = false
    while (step <= steps && !done) {
      // adjacent-pair counts over the symbol arrays, weighted by word freq
      val best = words
        .select(col("freq"),
          // try_element_at: the last symbol has no successor — [] / element_at
          // would throw under ANSI mode instead of yielding null
          explode(expr(
            "filter(transform(syms, (s, i) -> named_struct('a', s, 'b', try_element_at(syms, i + 2))), " +
              "p -> p.b is not null)"))
            .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .as[(String, String, Long)]
        .head(1)
      best.headOption match {
        case None => done = true
        case Some((a, b, n)) =>
          merges += ((step, a, b, n))
          val mapped = words.as[(Seq[String], Long)]
            .map { case (syms, f) => (mergePair(syms, a, b), f) }
            .toDF("syms", "freq")
          // truncate lineage every SECOND round (the d04 localCheckpoint
          // lesson, halved: an iterative plan otherwise grows by one
          // explode per step, but a depth-2 tail only recomputes one
          // cheap map over the word matrix, and each skipped checkpoint
          // saves a full materialization job)
          if (step % 2 == 0 || step == steps) {
            words = mapped.localCheckpoint(true)
            freeCheckpointBlocks(lastMaterialized)
            lastMaterialized = words
          } else words = mapped
          step += 1
      }
    }
    // the final matrix is not part of the result (merges is a driver
    // buffer) — release its checkpoint blocks before returning
    freeCheckpointBlocks(lastMaterialized)
    // lhs/rhs, not left/right: the latter are SQL reserved words and the
    // gate oracle quotes them differently per engine
    spark.createDataset(merges.toSeq)
      .toDF("step", "lhs", "rhs", "pair_count")
  }
}
