package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical table loaders + the TSDB "measurements" view.
  *
  * Design (SURVEY.md §1.2): the reference's directory-per-series store
  * [pub: tsdb/__init__.py, class TSDBVar — unverified, mount empty, see
  * SURVEY.md §0] becomes ONE long/narrow measurements DataFrame whose
  * series identity is plain columns. Every reference fetch then becomes a
  * declarative filter/groupBy that Catalyst can push into the parquet
  * scan. At 100 TB the table is parquet partitioned by date
  * (`dt=YYYY-MM-DD` replaces the reference's date-named chunk files) and
  * bucketed by series key so per-series windows need no shuffle; here it
  * is derived from the driver's `events` fixture (FIXTURES.md).
  */
/** One sample of the canonical measurements view — the typed row for
  * ingest normalization and per-partition imperative ops. */
case class Measurement(
    user_id: Long, event_type: String, event_id: Long,
    ts_us: Long, cents: Long, counter: Long, wrapped: Long)

object Tables {

  /** Counter capacity used to simulate 32-bit-style counter wrap on the
    * synthetic series (small enough that the fixture actually wraps). */
  val WrapCap = 1000000L

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events fixture carries parquet TIMESTAMP(NANOS) which Spark 4 refuses
    * outright; read it as raw nanos and floor-truncate to the engine's µs
    * TimestampType — exactly what DuckDB's µs TIMESTAMP does on the same
    * file, so both engines see identical instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every fixture table as a temp view so the engine's
    * `spark.sql(...)` surface works over the same catalog names the
    * DuckDB oracle uses — one SQL text, two engines. */
  def registerAll(s: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => table(s, d, n).createOrReplaceTempView(n))

  /** Half-open time-range scan [beginUs, endUs) with the predicate on
    * the RAW parquet column (int64 nanos), so it reaches the reader as
    * a PushedFilter → row-group min/max skipping; with a production
    * `dt=` layout this is partition pruning — the chunk-file-name
    * arithmetic of the reference, for free. Filtering the *converted*
    * timestamp would silently disable pushdown (the scan would read
    * everything and filter late). */
  def eventsInRange(s: SparkSession, d: String, beginUs: Long, endUs: Long): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.filter(col("ts") >= beginUs * 1000L && col("ts") < endUs * 1000L)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.filter(col("ts") >= timestamp_micros(lit(beginUs)) &&
          col("ts") < timestamp_micros(lit(endUs)))
    }
  }

  /** The TSDBVar universe: events + exact-integer mirror columns.
    *
    *  - `ts_us`   epoch microseconds (BIGINT) — timestamp math stays integral
    *  - `cents`   round(value*100) as BIGINT — the gauge as exact integer
    *  - `counter` per-series running sum of cents — a monotone Counter64
    *    stand-in (the fixture has no raw SNMP counters)
    *  - `wrapped` counter mod WrapCap — a bounded counter that wraps, to
    *    exercise the reference's wrap-corrected rate derivation
    *    [pub: tsdb/aggregator.py Aggregator.update]
    *
    * The integer mirrors exist for ORACLE DETERMINISM (SURVEY.md §7.4):
    * all sums/deltas are exact BIGINT arithmetic in both engines; doubles
    * appear only in final projections where both engines evaluate the
    * textually-identical IEEE expression.
    *
    * Scale note: the running sum is a per-series sequential scan. With the
    * production layout (partitioned by dt, bucketed by series) Spark plans
    * this as a sort within co-located partitions — no shuffle. On the
    * fixture it is one window exchange, which AQE sizes.
    */
  def measurements(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    events(spark, dir)
      .select(
        col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"),
        col("value"), col("props"))
      .withColumn("counter", sum(col("cents")).over(w))
      .withColumn("wrapped", col("counter") % WrapCap)
  }

  /** Typed view of [[measurements]]: compile-time row type for the
    * code paths where type safety pays (ingest normalization, typed
    * stateful streaming, property tests). */
  def measurementsDs(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[Measurement] = {
    import spark.implicits._
    measurements(spark, dir)
      .select("user_id", "event_type", "event_id", "ts_us", "cents", "counter", "wrapped")
      .as[Measurement]
  }

  /** DuckDB CTE textually mirroring [[measurements]] — prefix for every
    * oracle query over the measurements view. Lateral alias reuse keeps the
    * window expression written once, like the Spark side. */
  val MeasurementsSql: String =
    """WITH m AS (
      |  SELECT user_id, event_type, event_id,
      |         epoch_us(ts) AS ts_us,
      |         CAST(round(value*100) AS BIGINT) AS cents,
      |         value, props,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
      |           PARTITION BY user_id, event_type
      |           ORDER BY epoch_us(ts), event_id) AS BIGINT) AS counter,
      |         counter % 1000000 AS wrapped
      |  FROM events
      |)""".stripMargin
}
