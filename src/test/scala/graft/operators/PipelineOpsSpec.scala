package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  test("equalizeByKey samples ~min_n per group, keeps the smallest whole, and is repartition-stable") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 2200).map { i =>
      val g = if (i < 2000) "big" else if (i < 2150) "mid" else "small"
      (i.toLong, g, s"content ${rnd.nextLong()} $i")
    }
    val df = rows.toDF("id", "grp", "text")
    val kept = Sampling.equalizeByKey(df, "grp", "text").select("id", "grp")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byG = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // smallest group (50) survives in full; others land near 50
    assert(byG("small") == 50, s"smallest group downsampled: $byG")
    assert(byG("big") > 20 && byG("big") < 90, s"big group rate off: $byG")
    assert(byG("mid") > 20 && byG("mid") < 90, s"mid group rate off: $byG")
    // membership is a pure function of content: repartitioning changes nothing
    val kept2 = Sampling.equalizeByKey(df.repartition(7), "grp", "text").select("id", "grp")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sortBy(_._1).toSeq == kept2.sortBy(_._1).toSeq)
  }

  test("sessionize splits exactly at gaps > threshold") {
    val s = spark
    import s.implicits._
    // user 1: gaps 10, 100 (split), 10; user 2: single session
    val rows = Seq(
      (1L, 0L, 0L), (1L, 10L, 1L), (1L, 110L, 2L), (1L, 120L, 3L),
      (2L, 5L, 4L), (2L, 6L, 5L))
    val out = Sessionize.sessionize(rows.toDF("k", "t", "id"),
        keys = Seq("k"), orderCols = Seq("t", "id"), gapCol = col("t"), gap = 50L)
      .select("k", "id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq == Seq(
      (1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 1L),
      (2L, 4L, 0L), (2L, 5L, 0L)))
  }

  test("tokenCounts kernel matches the declarative explode+count twin") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "The quick brown fox the QUICK fox"),
      (1L, "a b a b a 42 c-c"),
      (2L, "")).toDF("doc_id", "text")
    val kernel = Dedup.tokenCounts(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val twin = docs
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(kernel.toSeq == twin.toSeq)
    assert(kernel.contains((0L, "quick", 2L)) && kernel.contains((1L, "a", 3L)))
  }
}
