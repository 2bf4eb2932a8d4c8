package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The read-boundary contract after the driver's testdata migration
  * (events.ts: parquet timestamp[us] on disk, ns-since-epoch LongType in
  * memory): every query assumes `Tables.withTsNanos` has normalized ts,
  * and both physical forms must normalize to the same values.
  */
class TablesSpec extends SparkSpec {

  test("events.ts arrives as ns-since-epoch LongType whatever the disk type") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == LongType)
    // sanity: values are ns magnitudes (year-2000+ epochs are >= 9.4e17 ns)
    val mn = ev.agg(min("ts")).collect()(0).getLong(0)
    assert(mn > 9.4e17.toLong, s"ts not ns-scale: $mn")
  }

  test("withTsNanos is a passthrough for legacy long ts and exact for NTZ") {
    val s = spark
    import s.implicits._
    val legacy = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    assert(Tables.withTsNanos(legacy).collect()(0).getLong(1) == 1700000000123456789L)
    // NTZ micros -> ns: value-preserving under the UTC session
    val ntz = Seq((1L, "2023-11-14 22:13:20.123456"))
      .toDF("event_id", "s")
      .select(col("event_id"), col("s").cast(TimestampNTZType).as("ts"))
    val ns = Tables.withTsNanos(ntz).collect()(0).getLong(1)
    assert(ns == 1700000000123456L * 1000L, s"got $ns")
  }

  test("tsFromNanos round-trips the normalized column to timestamp") {
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), Tables.tsFromNanos(col("ts")).as("t"))
      .limit(10).collect()
    ev.foreach { r =>
      assert(unixMicros(r.getTimestamp(1)) == r.getLong(0) / 1000L)
    }
  }

  private def unixMicros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L % 1000000L

  test("every table satisfies its declared read contract (fail-fast at read)") {
    // the loaders themselves throw on drift; reading each one IS the check
    Seq[(String, org.apache.spark.sql.DataFrame)](
      "region" -> Tables.region(spark, sfDir),
      "nation" -> Tables.nation(spark, sfDir),
      "customer" -> Tables.customer(spark, sfDir),
      "supplier" -> Tables.supplier(spark, sfDir),
      "part" -> Tables.part(spark, sfDir),
      "orders" -> Tables.orders(spark, sfDir),
      "lineitem" -> Tables.lineitem(spark, sfDir),
      "events" -> Tables.events(spark, sfDir),
      "documents" -> Tables.documents(spark, sfDir),
      "embeddings" -> Tables.embeddings(spark, sfDir)
    ).foreach { case (n, df) => assert(df.schema.fields.nonEmpty, n) }
  }

  test("a physical-type drift is a named error, not a silent misread") {
    // simulate the round-8 upstream change class: write a table whose
    // contract-relevant column has a type the queries would misread
    val dir = java.nio.file.Files.createTempDirectory("graft_contract").toString
    val s = spark
    import s.implicits._
    Seq((1L, "x")).toDF("r_regionkey", "wrong_name_col")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e1 = intercept[IllegalStateException](Tables.region(spark, dir).schema)
    assert(e1.getMessage.contains("missing column 'r_name'"), e1.getMessage)
    Seq((1, 2.5)).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e2 = intercept[IllegalStateException](Tables.region(spark, dir).schema)
    assert(e2.getMessage.contains("'r_name'") && e2.getMessage.contains("double"),
      e2.getMessage)
  }

  test("withTsNanos refuses a non-UTC session instead of shifting values") {
    val s = spark
    import s.implicits._
    val ntz = Seq((1L, "2023-11-14 22:13:20.123456")).toDF("event_id", "s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.withTsNanos(ntz))
      assert(e.getMessage.contains("America/New_York"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
