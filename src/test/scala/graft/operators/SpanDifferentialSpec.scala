package graft.operators

import graft.SparkSpec

/** Randomized differential check of the span pipeline: dupSpans +
  * scrubSpans vs a direct plain-Scala reimplementation (hash-free exact
  * gram strings, brute-force cross-doc ownership, explicit island
  * merge, explicit cut) on random corpora over a 3-word vocabulary —
  * small enough that duplicated 8-grams arise NATURALLY from the
  * generator rather than only from planted runs, so boundary shapes
  * (adjacent islands, doc-edge spans, full coverage) are exercised
  * without being hand-picked. Complements DupSpansHllSpec's
  * derivable-by-eye cases the way HungarianSpec's brute-force parity
  * complements its textbook cases.
  */
class SpanDifferentialSpec extends SparkSpec {

  private val L = 8

  private def refSpans(corpus: Map[Long, Vector[String]]): Map[Long, Seq[(Long, Long)]] = {
    val grams: Map[Long, Vector[Seq[String]]] = corpus.map { case (id, tk) =>
      id -> (if (tk.length < L) Vector.empty
             else (0 to tk.length - L).map(i => tk.slice(i, i + L).toSeq).toVector)
    }
    val owners: Map[Seq[String], Set[Long]] =
      grams.toSeq.flatMap { case (id, gs) => gs.map(g => (g, id)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    grams.map { case (id, gs) =>
      val hits = gs.zipWithIndex.collect {
        case (g, p) if owners(g).exists(_ != id) => p
      }
      val spans = hits.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, p) => List((p.toLong, (p + L - 1).toLong))
        case ((s, e) :: rest, p) =>
          if (p + L - 1 <= e + L) (s, (p + L - 1).toLong) :: rest
          else (p.toLong, (p + L - 1).toLong) :: (s, e) :: rest
      }.reverse
      id -> spans
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dupSpans + scrubSpans match a plain-Scala reimplementation on random corpora") {
    val s = spark
    import s.implicits._
    val vocab = Vector("aa", "bb", "cc")
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val corpus: Map[Long, Vector[String]] =
        (0L until 20L).map { id =>
          val n = rnd.nextInt(41) // 0..40 tokens, below-window docs included
          id -> Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
        }.toMap
      val docs = corpus.toSeq.map { case (id, tk) => (id, tk.mkString(" ")) }
        .toDF("doc_id", "text")

      val expSpans = refSpans(corpus)
      val gotSpans = Dedup.dupSpans(docs)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      assert(gotSpans == expSpans.filter(_._2.nonEmpty),
        s"seed $seed span mismatch")

      val expScrub = corpus.map { case (id, tk) =>
        val covered = expSpans(id).foldLeft(Set.empty[Long]) {
          case (acc, (a, b)) => acc ++ (a to b)
        }
        val kept = tk.zipWithIndex.collect { case (t, p) if !covered(p.toLong) => t }
        id -> ((tk.length.toLong, kept.length.toLong,
          (tk.length - kept.length).toLong, md5hex(kept.mkString(" "))))
      }
      val gotScrub = Dedup.scrubSpans(docs, Dedup.dupSpans(docs))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(gotScrub == expScrub, s"seed $seed scrub mismatch")
    }
  }
}
