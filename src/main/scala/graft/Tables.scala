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

  /** Declared read contracts, asserted at every table read (schema-only,
    * no data pass). Round 8 burned a round on a silent upstream physical-
    * type change (events.ts timestamp-nanos → timestamp[us] collapsed
    * event time 1000× and dropped 9 queries); this turns the next such
    * drift into a named error at the first read. Types are accepted as
    * CATEGORIES (any integral width, either timestamp form) so benign
    * widenings don't fail — only changes the queries would misread do.
    */
  private object Contract {
    import org.apache.spark.sql.types._
    val Integral = "integral"; val Dbl = "double"; val Str = "string"
    val Ts = "timestamp"; val TsOrNanosLong = "timestamp-or-ns-long"
    val VecF = "float-array"
    def ok(kind: String, dt: DataType): Boolean = kind match {
      case `Integral` => dt == IntegerType || dt == LongType || dt == ShortType
      case `Dbl` => dt == DoubleType || dt == FloatType
      case `Str` => dt == StringType
      case `Ts` => dt == TimestampType || dt == TimestampNTZType || dt == DateType
      case `TsOrNanosLong` => dt == LongType || ok(Ts, dt)
      case `VecF` => dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
    }
    val tables: Map[String, Seq[(String, String)]] = Map(
      "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
      "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Str,
        "n_regionkey" -> Integral),
      "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Str,
        "c_nationkey" -> Integral, "c_acctbal" -> Dbl, "c_mktsegment" -> Str),
      "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Str,
        "s_nationkey" -> Integral, "s_acctbal" -> Dbl),
      "part" -> Seq("p_partkey" -> Integral, "p_name" -> Str,
        "p_brand" -> Str, "p_type" -> Str, "p_size" -> Integral,
        "p_retailprice" -> Dbl),
      "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
        "o_orderstatus" -> Str, "o_totalprice" -> Dbl, "o_orderdate" -> Ts,
        "o_orderpriority" -> Str),
      "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
        "l_suppkey" -> Integral, "l_linenumber" -> Integral,
        "l_quantity" -> Dbl, "l_extendedprice" -> Dbl, "l_discount" -> Dbl,
        "l_tax" -> Dbl, "l_returnflag" -> Str, "l_linestatus" -> Str,
        "l_shipdate" -> Ts),
      "events" -> Seq("event_id" -> Integral, "ts" -> TsOrNanosLong,
        "user_id" -> Integral, "event_type" -> Str, "value" -> Dbl,
        "props" -> Str),
      "documents" -> Seq("doc_id" -> Integral, "text" -> Str,
        "lang" -> Str, "source" -> Str, "n_chars" -> Integral),
      "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> VecF,
        "label" -> Integral))
    def assertSchema(df: DataFrame, dir: String, name: String): DataFrame = {
      tables.get(name).foreach { cols =>
        val sch = df.schema
        cols.foreach { case (cn, kind) =>
          val f = sch.fields.find(_.name == cn).getOrElse(throw new IllegalStateException(
            s"read contract violated: $dir/$name.parquet is missing column '$cn' " +
              s"(have: ${sch.fieldNames.mkString(", ")}) — the testdata layout changed; " +
              "update graft.Tables.Contract deliberately if the change is intentional"))
          if (!ok(kind, f.dataType)) throw new IllegalStateException(
            s"read contract violated: $dir/$name.parquet column '$cn' reads as " +
              s"${f.dataType.simpleString}, contract expects $kind — an upstream " +
              "physical-type change (the round-8 events.ts lesson); update " +
              "graft.Tables.Contract deliberately if the change is intentional")
        }
      }
      df
    }
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // Legacy driver testdata wrote events.ts as parquet TIMESTAMP(NANOS),
    // which Spark's vectorized reader only accepts as a long (ns since
    // epoch); current testdata writes timestamp[us]. The conf keeps old
    // scaled dirs readable; `withTsNanos` normalizes both to one contract.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Contract.assertSchema(s.read.parquet(s"$dir/$name.parquet"), dir, name)
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
      // The NTZ branch casts through session-local TimestampType, which
      // is value-preserving ONLY under a UTC session. Every entry point
      // pins UTC; enforce it at the conversion site so a future non-UTC
      // session is a named error, not a silent shift of every ts.
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"withTsNanos requires spark.sql.session.timeZone=UTC (got '$tz'): " +
          "the NTZ->long conversion is session-zone-dependent and would " +
          "silently shift every ts under any other zone")
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
