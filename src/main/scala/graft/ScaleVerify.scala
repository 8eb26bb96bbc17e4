package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** At-scale differential-correctness corpus builder (VERDICT r11 next
  * #1 — "every oracle gate so far runs at toy scale"): writes a
  * TRANSFORMED full replica of an sf dir — every table the oracle
  * pipeline reads, as the single tz-naive-µs parquet files the driver
  * testdata uses — so the EXISTING gates (`graft.Verify` →
  * `scripts/check_driver.py`) hash-compare Spark vs DuckDB at
  * magnitudes and row counts the fixture scales never reach. Driven by
  * `scripts/scale_verify.py`; results land in CORRECTNESS_SCALE.md.
  *
  * Three arms, each aimed at a documented exactness bound (§7.4):
  *
  *  - `mag-sum` — the Σx 2^53 edge: events.value is rewritten to
  *    cents·10^4 (an exact integer-of-cents double), which multiplies
  *    every derived cents by 10^6; the corpus-wide Σcents lands
  *    ≈ 2.8e15 ≈ 2^51.3, so every "exact while integer-valued < 2^53"
  *    guarantee (the avg substitution's bit-identical claim, counter
  *    running sums, rate numerators) is exercised near its documented
  *    edge instead of at toy magnitude. lineitem's quantity and
  *    extendedprice scale ×1000 (the DECIMAL(18,4) casts still fit:
  *    1.05e8 ≪ 10^14) for the decimal-sum families. Families that
  *    SQUARE cents exceed int64/2^53 here BY DESIGN and are the
  *    expected-divergence set — they are verified in `mag-moment`.
  *  - `mag-moment` — the Σx² int64 edge: events.value := cents (every
  *    derived cents ×100): Σcents² ≈ 7.8e17, under int64's 9.2e18
  *    with every x² an exact integer double, so the moment families
  *    (variance / corr / slope / zscore / autocorr / xcorr / trend)
  *    verify at 100× magnitude with second-moment sums within an
  *    order of magnitude of their documented bound.
  *  - `rows N` — the row axis: an N× FK-CONSISTENT replica (all key
  *    and FK columns offset by per-table strides so every uniqueness
  *    and join-cardinality assumption the queries make still holds;
  *    documents Caesar-decorrelated and embeddings rotated exactly as
  *    ScaleStress does, so near-dup structure scales instead of going
  *    quadratic). At the default source sf0.1 ×10 this is 100× the
  *    per-round sf0.01 oracle gate.
  *
  * The transforms are computed once by Spark and WRITTEN; both engines
  * then read the same bytes, so transform-side float determinism never
  * enters the compare. Timestamp columns are cast to timestamp_ntz
  * before writing (session TZ is UTC, so wall-clock == instant) —
  * the replica carries the same isAdjustedToUTC=false µs shape as the
  * driver testdata, which both engines read identically.
  */
object ScaleVerify {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val arm = args(2)
    val factor = if (args.length > 3) args(3).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()
    arm match {
      case "mag-sum"    => buildMag(spark, src, out, sumEdge = true)
      case "mag-moment" => buildMag(spark, src, out, sumEdge = false)
      case "rows"       => buildRows(spark, src, out, factor)
      case "rows-mag"   => buildRows(spark, src, out, factor, magMoment = true)
      case "len"        => buildLen(spark, src, out, factor)
      case other => sys.error(s"unknown arm '$other' (mag-sum | mag-moment | rows | rows-mag | len)")
    }
    println(s"""{"scale_verify_corpus":"$out","arm":"$arm"}""")
    spark.stop()
  }

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Byte-identical copy for untransformed tables — a Spark round-trip
    * would rewrite tz-naive timestamps as UTC-adjusted µs and change
    * the logical type DuckDB sees; copying preserves the driver's
    * exact physical file. */
  private def copyVerbatim(src: String, out: String, t: String): Unit =
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$src/$t.parquet"),
      java.nio.file.Paths.get(s"$out/$t.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

  /** Write one SINGLE-FILE parquet at `<out>/<t>.parquet` (DuckDB's
    * `read_parquet` in check_driver opens a file, not a directory)
    * with TimestampType columns cast to timestamp_ntz. */
  private def writeSingle(df: DataFrame, out: String, t: String): Unit = {
    val ntz = Util.ntzNormalize(df)
    val tmp = s"$out/_tmp_$t"
    ntz.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$out/$t.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(tmp).listFiles().foreach(_.delete())
    new java.io.File(tmp).delete(): Unit
  }

  private def buildMag(spark: SparkSession, src: String, out: String,
                       sumEdge: Boolean): Unit = {
    // cents_orig as an exact double (≤ 5.7e4 at sf0.1 — integer-valued,
    // so every later round(value*100) in queries and oracles is the
    // identity-round of an exact integer: no half-way hazards)
    val centsD = round(col("value") * 100).cast("long").cast("double")
    val newValue = if (sumEdge) centsD * lit(10000.0) else centsD
    writeSingle(Tables.events(spark, src).withColumn("value", newValue),
      out, "events")
    if (sumEdge) {
      writeSingle(Tables.lineitem(spark, src)
        .withColumn("l_quantity", col("l_quantity") * 1000)
        .withColumn("l_extendedprice", col("l_extendedprice") * 1000),
        out, "lineitem")
    } else copyVerbatim(src, out, "lineitem")
    AllTables.filterNot(t => t == "events" || (sumEdge && t == "lineitem"))
      .foreach(copyVerbatim(src, out, _))
  }

  /** `rows-mag` (round 13, VERDICT r12 next #2 — the COMBINED axis):
    * the same FK-consistent N× replica with events.value ALSO
    * transformed to the mag-moment magnitude (value := cents, every
    * derived cents ×100). Round 12's q_agg_stats find was precisely an
    * INTERACTION bug — per-term magnitudes in bounds, group size
    * moved — so this arm moves BOTH at once: at ×10 rows × ×100
    * magnitude the corpus Σcents² ≈ 7.8e18 sits just under int64's
    * 9.2e18, the deepest single-corpus stress any int64-accumulating
    * kernel can face without crossing its documented bound. */
  private def buildRows(spark: SparkSession, src: String, out: String,
                        factor: Int, magMoment: Boolean = false): Unit = {
    require(factor >= 2 && factor <= 26,
      s"rows factor in [2, 26] (Caesar decorrelation is alphabet-bound): $factor")
    // fixed dimension domains replicate verbatim
    copyVerbatim(src, out, "region")
    copyVerbatim(src, out, "nation")

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame =
      (0 until factor).map { k =>
        shifts.foldLeft(df) { case (d, (c, st)) =>
          d.withColumn(c, col(c) + lit(k * st))
        }
      }.reduce(_ unionByName _)

    val customer = Tables.customer(spark, src)
    val orders = Tables.orders(spark, src)
    val part = Tables.part(spark, src)
    val supplier = Tables.supplier(spark, src)
    val lineitem = Tables.lineitem(spark, src)
    val cSt = stride(customer, "c_custkey")
    val oSt = stride(orders, "o_orderkey")
    val pSt = stride(part, "p_partkey")
    val sSt = stride(supplier, "s_suppkey")
    writeSingle(replicate(customer, "c_custkey" -> cSt), out, "customer")
    writeSingle(replicate(orders, "o_orderkey" -> oSt, "o_custkey" -> cSt),
      out, "orders")
    writeSingle(replicate(part, "p_partkey" -> pSt), out, "part")
    writeSingle(replicate(supplier, "s_suppkey" -> sSt), out, "supplier")
    writeSingle(replicate(lineitem, "l_orderkey" -> oSt,
      "l_partkey" -> pSt, "l_suppkey" -> sSt), out, "lineitem")

    val ev0 = Tables.events(spark, src)
    // rows-mag: the mag-moment value transform (an exact
    // integer-of-cents double) composed with the row replica
    val ev =
      if (magMoment)
        ev0.withColumn("value", round(col("value") * 100).cast("long").cast("double"))
      else ev0
    writeSingle(replicate(ev,
      "user_id" -> stride(ev, "user_id"),
      "event_id" -> stride(ev, "event_id")), out, "events")

    // documents: per-replica Caesar-shifted text (bijective char map —
    // within-replica shingle structure preserved exactly, cross-replica
    // overlap ~0 so candidate-pair spaces grow linearly, not
    // quadratically), doc_id offset; same decorrelation ScaleStress
    // uses, re-derived here so the replica is a complete verify corpus
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def shifted(s: String, k: Int): String = s.drop(k) + s.take(k)
    val docs = Tables.documents(spark, src)
    val dSt = stride(docs, "doc_id")
    writeSingle((0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k * dSt)).as("doc_id"),
        (if (k == 0) col("text")
         else translate(col("text"), lower + upper,
           shifted(lower, k) + shifted(upper, k))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _), out, "documents")

    // embeddings: per-replica array rotation (orthogonal — norms and
    // within-replica cosines preserved, cross-replica cosines
    // scrambled), vec_id offset (see end of buildRows)
    val emb = Tables.embeddings(spark, src)
    val vSt = stride(emb, "vec_id")
    writeSingle((0 until factor).map { k =>
      emb.select(
        (col("vec_id") + lit(k * vSt)).as("vec_id"),
        (if (k == 0) col("embedding")
         else expr(s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
           s"slice(embedding, 1, $k))")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _), out, "embeddings")
  }

  /** `len N` — the series-LENGTH axis (round 12, the one dimension
    * `rows` cannot move): the FK-consistent row replica multiplies the
    * NUMBER of series while keeping every series its fixture length,
    * but the widened moment sums, the chunked Holt/EMA scans, the
    * store's multi-res cascades, and every window partition grow with
    * LENGTH, not series count. Here events becomes N time-shifted
    * copies of itself — each copy the whole table displaced by
    * (global span + 1 h) with event_id offset for uniqueness and
    * user_id/event_type/value untouched — so every series keeps its
    * key and value distribution but is N× longer, with one benign 1-h
    * seam per copy (deterministically visible to BOTH engines, so
    * gap/heartbeat queries stay comparable). All other tables copy
    * verbatim; run the events-derived families against this corpus. */
  private def buildLen(spark: SparkSession, src: String, out: String,
                       factor: Int): Unit = {
    require(factor >= 2 && factor <= 64, s"len factor in [2, 64]: $factor")
    val ev = Tables.events(spark, src)
    val r = ev.agg(
      min(expr("unix_micros(ts)")).as("mn"),
      max(expr("unix_micros(ts)")).as("mx"),
      max(col("event_id")).as("me")).head()
    val shiftUs = r.getLong(1) - r.getLong(0) + 3600L * 1000000L
    val eSt = r.getLong(2) + 1L
    writeSingle((0 until factor).map { k =>
      ev.select(
        (col("event_id") + lit(k * eSt)).as("event_id"),
        expr(s"timestamp_micros(unix_micros(ts) + $k * ${shiftUs}L)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _), out, "events")
    AllTables.filterNot(_ == "events").foreach(copyVerbatim(src, out, _))
  }
}
