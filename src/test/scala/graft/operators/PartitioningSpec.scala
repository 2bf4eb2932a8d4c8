package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain-join result on a skewed key") {
    val s = spark
    import s.implicits._
    // 90% of fact rows hit key 7 — the pathological hot key
    val fact = (0 until 5000).map(i => (if (i % 10 == 0) i % 5 else 7, i.toLong))
      .toDF("k", "v")
    val dim = (0 until 10).map(i => (i, s"dim_$i")).toDF("k", "name")

    val plain = fact.join(dim, "k").select("k", "v", "name")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted
    val salted = Partitioning.saltedJoin(fact, dim, "k", numSalts = 8)
      .select(fact("k"), col("v"), col("name"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin joins on (key, salt) so the hot key spreads over reducers") {
    val s = spark
    import s.implicits._
    val fact = (0 until 100).map(i => (7, i.toLong)).toDF("k", "v")
    val dim = Seq((7, "x")).toDF("k", "name")
    val df = Partitioning.saltedJoin(fact, dim, "k", numSalts = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column not in join plan:\n$p")
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    import s.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    (0L until 1000L).map(i => (i, s"o$i")).toDF("okey", "oval")
      .write.bucketBy(8, "okey").sortBy("okey").mode("overwrite").saveAsTable("b_orders")
    (0L until 5000L).map(i => (i % 1000, i)).toDF("okey", "lval")
      .write.bucketBy(8, "okey").sortBy("okey").mode("overwrite").saveAsTable("b_lines")

    // force a sort-merge join so the no-shuffle claim is non-vacuous
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "okey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // co-located bucketed join: no hash-partitioning exchange either side
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() == 5000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
  }

  test("zorderKey matches a brute-force bit interleave") {
    val s = spark
    import s.implicits._
    def brute(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.reduce(_ | _)
    val df = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val got = df.withColumn("z", Partitioning.zorderKey(5, col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (x <- 0L until 32L; y <- 0L until 32L)
      assert(got((x, y)) == brute(x, y, 5), s"($x,$y)")
    // distinct inputs -> distinct keys (bijective on the bit range)
    assert(got.values.toSeq.distinct.size == 32 * 32)
  }

  test("z-ordered layout prunes files for predicates on EITHER dimension") {
    val s = spark
    import s.implicits._
    // points on a 64x64 grid; "files" = 16 range partitions of the sort
    // key, "min/max stats" = per-partition bounds (what parquet footers
    // would carry). A y-slice predicate can skip every file whose y-range
    // misses it — the linear (x-major) layout leaves ALL files spanning
    // all of y, so it prunes nothing on y.
    val pts = (0L until 4096L).map(i => (i % 64L, i / 64L)).toDF("x", "y")
    def filesOverlappingYSlice(sorted: org.apache.spark.sql.DataFrame): Int =
      sorted.repartitionByRange(16, col("sk"))
        .select(col("y"), spark_partition_id().as("p"))
        .groupBy("p").agg(min("y").as("lo"), max("y").as("hi"))
        .collect().count(r => r.getLong(1) <= 7L && r.getLong(2) >= 0L)
    val z = filesOverlappingYSlice(
      pts.withColumn("sk", Partitioning.zorderKey(6, col("x"), col("y"))))
    val lin = filesOverlappingYSlice(pts.withColumn("sk", col("x") * 64 + col("y")))
    assert(lin == 16, s"x-major layout should never prune on y: $lin")
    // z-order: 16 contiguous z-chunks are 16x16 blocks; only the bottom
    // row of blocks (y in [0,16)) can touch y<=7
    assert(z <= 4, s"z-order should prune most files on a y-slice: $z")
  }
}
