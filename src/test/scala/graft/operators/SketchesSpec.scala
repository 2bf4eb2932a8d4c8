package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{Encoders, functions => F}

import scala.collection.immutable.TreeSet

class SketchesSpec extends SparkSpec {
  import Sketches._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("insert keeps the k smallest distinct values") {
    val vals = (1 to 500).map(i => md5hex(s"v$i"))
    val st = vals.foldLeft(TreeSet.empty[String])(insert(8, _, _))
    assert(st.toSeq == vals.distinct.sorted.take(8))
    // idempotent re-insert
    assert(vals.foldLeft(st)(insert(8, _, _)) == st)
  }

  test("merge order does not matter (associative + commutative union)") {
    val (a, b) = (1 to 400).map(i => md5hex(s"x$i")).splitAt(137)
    val sa = a.foldLeft(TreeSet.empty[String])(insert(16, _, _))
    val sb = b.foldLeft(TreeSet.empty[String])(insert(16, _, _))
    val m1 = sb.foldLeft(sa)(insert(16, _, _))
    val m2 = sa.foldLeft(sb)(insert(16, _, _))
    assert(m1 == m2)
    assert(m1.toSeq == (a ++ b).sorted.take(16))
  }

  test("estimate is within 15% on a 20k-value universe and exact below k") {
    val k = 128
    val mins = (1 to 20000).map(i => md5hex(s"u$i")).sorted.take(k)
    val est = estimate(k, mins)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15, s"est=$est")
    assert(estimate(k, mins.take(5)) == 5L)
  }

  test("typed kernel partials equal the declarative explode+md5 path") {
    import graft.functions.TextFunctions._
    val docs = graft.Tables.documents(spark, sfDir)
    val k = 16
    val agg = F.udaf(new KmvAgg(k), Encoders.STRING)
    def finish(hashes: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] = {
      val spark2 = spark
      import spark2.implicits._
      hashes.groupBy("source").agg(agg(F.col("h")).as("mins"))
        .as[(String, Seq[String])].collect().toMap
    }
    val declarative = finish(docs
      .select(F.col("source"), F.explode(shingles(tokens(F.col("text")))).as("sh"))
      .select(F.col("source"), F.md5(F.col("sh")).as("h")))
    val kernel = finish(Sketches.kmvShinglePartials(docs, k))
    assert(kernel == declarative)
  }

  test("aggregator equals driver fold and is partitioning-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val k = 32
    val rows = (1 to 3000).map(i => ("g" + (i % 3), md5hex(s"s${i % 700}")))
    val agg = F.udaf(new KmvAgg(k), Encoders.STRING)
    def run(parts: Int): Map[String, Seq[String]] =
      rows.toDF("g", "h").repartition(parts)
        .groupBy("g").agg(agg(F.col("h")).as("mins"))
        .as[(String, Seq[String])].collect().toMap
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(k).toSeq
    }
    assert(run(1) == expected)
    assert(run(7) == expected)
  }

  test("log2HistQuantiles brackets the exact percentile within its bin") {
    val spark2 = spark
    import spark2.implicits._
    // heavy-tailed values so the quantile bins differ
    val vals = (1 to 5000).map(i => (i.toLong * i.toLong) % 30000L + 1L)
    val df = vals.toDF("v")
    val out = Sketches.log2HistQuantiles(df, "v", Seq(500, 900, 990))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sorted = vals.sorted
    Seq(500, 900, 990).foreach { q =>
      // exact upper-rank percentile: smallest v with rank*1000 >= n*q
      val exact = sorted((((sorted.size.toLong * q + 999) / 1000) - 1).toInt)
      val (bin, estUpper) = out(q)
      assert(estUpper == (1L << bin) - 1)
      // the exact percentile lies inside the chosen bin [2^(bin-1), 2^bin)
      assert(exact <= estUpper && exact >= (1L << (bin - 1)),
        s"q=$q exact=$exact bin=$bin")
    }
  }

  test("CMS estimates are one-sided: est >= exact for every word (t20)") {
    val rows = graft.SparkEntry.queries("t20_cms_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS under-counted '${r.getString(0)}': $est < $exact")
    }
  }

  test("log2HistQuantiles is partitioning-invariant (mergeable cells)") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 2000).map(i => (i * 7L) % 5000L + 1L).toDF("v")
    def run(parts: Int) = Sketches.log2HistQuantiles(df.repartition(parts), "v", Seq(500, 990))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(6))
  }
}
