package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style within-document repetition filters (Rae et al. 2021,
  * arXiv:2112.11446, Table A1's repetition signals, adapted to the
  * line-less token-stream corpus): documents dominated by a single word,
  * a single bigram, or repeated 5-grams are low-quality scraped content
  * a pre-training pipeline drops before tokenization.
  *
  * All three signals are INTEGER micro-fractions (long division — no
  * doubles anywhere), so a SQL engine reproduces them bit-exactly:
  *   top_word_micro  = 1e6 · max word count / n_words
  *   top2gram_micro  = 1e6 · max bigram count / n_bigrams
  *   dup5gram_micro  = 1e6 · (n_5grams − distinct 5-grams) / n_5grams
  * keep applies Gopher-inspired cuts (the paper's thresholds are
  * line/char-fraction variants; these are their token-stream analogs):
  * top_word < 20%, top bigram < 18%, duplicated 5-grams < 30%.
  *
  * 100 TB shape: one row-local mapPartitions pass — per-doc hash-map
  * counting in a tight JVM loop (the Column-HOF equivalent is
  * CodegenFallback-interpreted, the t29/simhash lesson), ZERO shuffle,
  * stateless — runs at scan speed on any corpus and streams as-is.
  */
object Repetition {

  def signals(docs: DataFrame, id: String = "doc_id",
              text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text)).as[(Long, String)]
      .mapPartitions { it =>
        val wordRe = java.util.regex.Pattern.compile("[a-z0-9]+")
        it.map { case (docId, t) =>
          val m = wordRe.matcher(
            if (t == null) "" else t.toLowerCase(java.util.Locale.ROOT))
          val toks = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) toks += m.group()
          val n = toks.length
          def topCount(grams: Iterator[String]): (Long, Long, Long) = {
            // (occurrences, distinct, max count) in one pass
            val cnt = scala.collection.mutable.HashMap.empty[String, Long]
            var occ = 0L
            grams.foreach { g => cnt(g) = cnt.getOrElse(g, 0L) + 1L; occ += 1L }
            val mx = if (cnt.isEmpty) 0L else cnt.valuesIterator.max
            (occ, cnt.size.toLong, mx)
          }
          val (nw, _, topW) = topCount(toks.iterator)
          val (n2, _, top2) = topCount(
            (0 until n - 1).iterator.map(i => toks(i) + " " + toks(i + 1)))
          val (n5, d5, _) = topCount(
            (0 until n - 4).iterator.map(i =>
              s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)} ${toks(i + 3)} ${toks(i + 4)}"))
          val topWordMicro = if (nw == 0) 0L else 1000000L * topW / nw
          val top2Micro = if (n2 == 0) 0L else 1000000L * top2 / n2
          val dup5Micro = if (n5 == 0) 0L else 1000000L * (n5 - d5) / n5
          val keep = topWordMicro < 200000L && top2Micro < 180000L &&
            dup5Micro < 300000L
          (docId, nw, topWordMicro, top2Micro, dup5Micro, if (keep) 1L else 0L)
        }
      }
      .toDF("doc_id", "n_words", "top_word_micro", "top2gram_micro",
        "dup5gram_micro", "keep")
  }
}
