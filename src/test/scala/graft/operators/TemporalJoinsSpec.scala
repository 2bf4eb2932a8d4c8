package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {

  test("asofJoin matches the brute-force latest-prior scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // left and right rows over a handful of keys, colliding order values
    // on purpose so the (order, id) tie-break is exercised
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong))
    val right = (1000 until 1150).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, rnd.nextInt(100)))

    val got = TemporalJoins.asofJoin(
        left.toDF("id", "k", "o"),
        right.toDF("id", "k", "o", "v"),
        keys = Seq("k"), orderCols = Seq("o", "id"), payload = Seq("id", "v"))
      .select("id", "asof_id", "asof_v")
      .collect().map(r =>
        (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toSeq.sortBy(_._1)

    val expected = left.map { case (id, k, o) =>
      // latest right row of the same key strictly before (o, id) in the
      // (o, id) total order; right ids are >= 1000 so cross-side id ties
      // cannot occur
      val prior = right.filter(r => r._2 == k &&
        (r._3 < o || (r._3 == o && r._1 < id)))
      if (prior.isEmpty) (id, -1L, -1)
      else {
        val best = prior.maxBy(r => (r._3, r._1))
        (id, best._1, best._4)
      }
    }.sortBy(_._1)

    assert(got == expected)
    assert(got.exists(_._2 >= 0) && got.exists(_._2 == -1L),
      "fixture should cover both matched and unmatched left rows")
  }

  test("overlapJoin matches the naive all-pairs overlap filter") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // intervals with lengths from sub-bucket to several buckets so pairs
    // sharing 0, 1, and many candidate buckets are all present
    def ivs(n: Int, base: Long) = (0 until n).map { i =>
      val st = rnd.nextInt(5000).toLong
      (base + i, st, st + 1 + rnd.nextInt(900).toLong)
    }
    val a = ivs(120, 0L)
    val b = ivs(120, 10000L)

    val got = TemporalJoins.overlapJoin(
        a.toDF("id", "s", "e"), b.toDF("id", "s", "e"), bucket = 300L)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val expected = (for {
      (ai, as_, ae) <- a
      (bi, bs, be) <- b
      if as_ <= be && bs <= ae
    } yield (ai, bi)).sorted

    assert(got == expected)
    assert(expected.nonEmpty)
    // emit-once: no pair may appear twice even when intervals share
    // multiple buckets
    assert(got.distinct.size == got.size)
  }
}
