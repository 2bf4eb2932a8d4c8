package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All queries take an `sfDir` so the same code runs at any scale factor —
  * on a real cluster these would be external tables partitioned by date /
  * stream, and every reader below benefits from parquet column pruning and
  * predicate pushdown (verified via .explain in the specs).
  */
object Tables {
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // Legacy driver testdata wrote events.ts as parquet TIMESTAMP(NANOS),
    // which Spark's vectorized reader only accepts as a long (ns since
    // epoch); current testdata writes timestamp[us]. The conf keeps old
    // scaled dirs readable; `withTsNanos` normalizes both to one contract.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts (ns-since-epoch long, see above) → TimestampType (µs). */
  def tsFromNanos(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      (c / org.apache.spark.sql.functions.lit(1000L)).cast("long"))

  /** Normalize an events frame so `ts` is ns-since-epoch LongType — the
    * in-memory contract every query assumes — regardless of the on-disk
    * physical type: timestamp[us] (current driver testdata, read as
    * TIMESTAMP_NTZ) or TIMESTAMP(NANOS)-as-long (legacy dirs). The NTZ
    * branch casts through session-local TimestampType; every entry point
    * pins spark.sql.session.timeZone=UTC, so the cast is value-preserving.
    * Works on both batch and streaming frames (pure projection).
    */
  def withTsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df
    case _ =>
      import org.apache.spark.sql.functions._
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
  }

  def region(s: SparkSession, dir: String): DataFrame     = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = t(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame     =
    withTsNanos(t(s, dir, "events"))

  private val eventCountCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Long]

  /** Row count of `events`, cached per (session, dir) — the scalar that
    * SF-scales the synthetic adapters (frame/stream counts derived from
    * data volume, so per-key density stays constant as input grows). A
    * parquet count() is metadata-cheap; keying on the session identity
    * avoids serving a count computed by a stopped session.
    */
  def eventCount(s: SparkSession, dir: String): Long =
    eventCountCache.getOrElseUpdate(
      (System.identityHashCode(s), dir), events(s, dir).count())
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")

  /** Row count of `documents`, cached per (session, dir) — same contract
    * and rationale as `eventCount` (SF-scaling scalar, metadata-cheap).
    */
  def docCount(s: SparkSession, dir: String): Long =
    eventCountCache.getOrElseUpdate(
      (System.identityHashCode(s), s"$dir#documents"), documents(s, dir).count())

  /** Row count of `customer`, cached per (session, dir) — same contract
    * and rationale as `eventCount` (dimension-modulus scalar).
    */
  def custCount(s: SparkSession, dir: String): Long =
    eventCountCache.getOrElseUpdate(
      (System.identityHashCode(s), s"$dir#customer"), customer(s, dir).count())
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}

/** One catalog entry: a named Spark query plus (when SQL-expressible) the
  * equivalent DuckDB SQL for the driver's oracle compare. Column names and
  * rounding must match exactly between the two (driver hashes values after
  * sorting columns by name).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Included in the per-round benchmark run (sf0.1). */
    bench: Boolean = true,
    /** When set, the benchmark times THIS plan instead of `fn` — used
      * where the correctness gate wraps the production path in a
      * measurement arm that is not itself the operator (the e06/e09/e12
      * recall gates run an exact nprobe=nlist probe over every query to
      * pin the floor; the published number should measure the
      * production-nprobe ANN path, BENCH.md). Verify always runs `fn`.
      */
    benchFn: Option[(SparkSession, String) => DataFrame] = None
)
