package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  /** Single-threaded reference of the integer power iteration. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var mass = nodes.map(_ -> 1000L).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) => mass(s) * 850L / (1000L * outdeg(s)) }.sum
      }
      mass = nodes.map(n => n -> (150L + in.getOrElse(n, 0L))).toMap
    }
    mass
  }

  private val edges: Seq[(Long, Long)] = {
    // a hub (0) pointed at by everyone, plus a ring — asymmetric masses
    val ring = (1L to 20L).map(i => (i, i % 20L + 1L))
    val toHub = (1L to 20L).map(i => (i, 0L))
    val back = Seq((0L, 1L))
    ring ++ toHub ++ back
  }

  test("integer pagerank equals the single-threaded reference") {
    val s = spark
    import s.implicits._
    val df = edges.toDF("src", "dst")
    val got = PageRank.run(df, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(edges, 5))
    // the hub must dominate the ring nodes
    assert(got(0L) > got.filter(_._1 != 0L).values.max)
  }

  test("result is partitioning-invariant (integer sums commute)") {
    val s = spark
    import s.implicits._
    def run(parts: Int) = PageRank
      .run(edges.toDF("src", "dst").repartition(parts), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(6))
  }

  test("everyNodeReceives fast path is bit-equal to the left-join form " +
      "on a symmetrized edge list (the q40 construction)") {
    val s = spark
    import s.implicits._
    // symmetrize the fixture the way q40 symmetrizes lineitem edges:
    // union with the reversed copy, so every node has an in-edge
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val df = sym.toDF("src", "dst")
    val slow = PageRank.run(df, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = PageRank.run(df, "src", "dst", iters = 5, everyNodeReceives = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
    assert(fast == reference(sym, 5))
  }

  test("duplicate edge rows do not change the result (distinct edge set)") {
    val s = spark
    import s.implicits._
    val dup = (edges ++ edges ++ edges.take(5)).toDF("src", "dst")
    val got = PageRank.run(dup, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(edges, 3))
  }
}
