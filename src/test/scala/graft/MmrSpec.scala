package graft

import org.apache.spark.sql.functions._

/** Independent check of the e15 MMR rerank: a hand-built 5-vector corpus
  * where the diversified pick order provably differs from pure top-k —
  * two near-identical high-relevance vectors (the redundancy MMR exists
  * to break) and a less-relevant but orthogonal one. Expected trace
  * derived by a plain-Scala greedy sharing nothing with the operator.
  */
class MmrSpec extends SparkSpec {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("e15 diversifies: near-duplicate runner-up is deferred for the orthogonal pick") {
    val s = spark
    import s.implicits._
    val d = 64
    def vec(f: Int => Double): Array[Float] = Array.tabulate(d)(i => f(i).toFloat)
    // query 0 = axis-0; 1 and 2 near-identical (sim ≈ 0.9997) with the
    // top relevance; 3 slightly less relevant but pointing off-plane
    // (sim to 1 ≈ 0.60): 7·rel₃ − 3·sim₃₁ > 7·rel₂ − 3·sim₂₁, so MMR
    // must defer the near-duplicate; 4 is the far distractor
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> vec(i => if (i == 0) 1.0 else 0.0),
      1L -> vec(i => if (i == 0) 0.8 else if (i == 1) 0.6 else 0.0),
      2L -> vec(i => if (i == 0) 0.79 else if (i == 1) 0.613 else 0.0),
      3L -> vec(i => if (i == 0) 0.75 else if (i == 2) 0.661 else 0.0),
      4L -> vec(i => if (i == 3) 1.0 else 0.0))
    val dir = java.nio.file.Files.createTempDirectory("mmrspec").toString
    vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val q = graft.queries.SimilarityQueries.all.find(_.name == "e15_mmr_rerank").get
    // catalog entry uses vec_id < 50 queries / n=20 / k=5: on this corpus
    // every vector is a query and every other vector a candidate
    val out = q.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // independent greedy over quantized micro-cosines, λ=0.7 as 7/3
    val qv = vecs.map { case (id, v) => id -> v.map(x => math.floor(x.toDouble * 1000)) }.toMap
    def relMicro(a: Long, b: Long): Long = math.floor(cos(qv(a), qv(b)) * 1e6).toLong
    def greedy(qid: Long): Seq[(Long, Long)] = {
      val cands = vecs.map(_._1).filter(_ != qid).sortBy(c => (-relMicro(qid, c), c))
      var sel = Vector.empty[Long]
      val picks = collection.mutable.Buffer.empty[(Long, Long)]
      while (sel.length < math.min(5, cands.length)) {
        val scored = cands.filterNot(sel.contains).map { c =>
          val score =
            if (sel.isEmpty) 7L * relMicro(qid, c)
            else 7L * relMicro(qid, c) - 3L * sel.map(s0 => relMicro(c, s0)).max
          (score, c)
        }
        val (sc, c) = scored.maxBy { case (sc, c) => (sc, -c) }
        sel :+= c; picks += ((c, sc))
      }
      picks.toSeq
    }
    for (qid <- vecs.map(_._1)) {
      val expected = greedy(qid)
      expected.zipWithIndex.foreach { case ((nid, sc), i) =>
        assert(out((qid, (i + 1).toLong)) == ((nid, sc)),
          s"query $qid pick ${i + 1}: ${out((qid, (i + 1).toLong))} vs ($nid, $sc)")
      }
    }
    // the diversification itself: for query 0 pure relevance ranks the
    // near-duplicate pair 1,2 first; MMR keeps 1 then defers 2 for the
    // orthogonal 3
    val mmrOrder = (1 to 4).map(p => out((0L, p.toLong))._1)
    assert(mmrOrder.take(2) == Seq(1L, 3L),
      s"expected diversified (1, 3, ...) for query 0, got $mmrOrder")
    val relOrder = Seq(1L, 2L, 3L, 4L).sortBy(c => (-relMicro(0L, c), c))
    assert(relOrder.take(2) == Seq(1L, 2L), "precondition: top-2 by relevance is the near-dup pair")
  }
}
