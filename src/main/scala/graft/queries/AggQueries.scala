package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables, Util}
import graft.Tables.MeasurementsSql
import graft.functions.TimeWeightedMean

/** SURVEY.md §2 E: aggregation families. Determinism strategy
  * throughout: DECIMAL or BIGINT accumulation (order-insensitive under
  * partial aggregation — the property a 1000-executor agg needs),
  * doubles only in final textually-parallel projections; percentiles
  * rounded to 4 dp (both engines use linear interpolation). */
object AggQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_agg_group",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // exact DECIMAL accumulation (order-insensitive under partial agg),
      // ONE final cast to DOUBLE — the driver's pandas compare stringifies
      // values, and Decimal('77782.0000') != float 77782.0 there
      Tables.lineitem(s, d)
        .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).cast("double").as("sum_qty"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,4))")).cast("double").as("sum_base_price"),
          sum(expr(
            """CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
              |(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
              |AS DECIMAL(18,4))""".stripMargin)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    QueryDef("q_agg_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS users FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy("event_type")
    },

    // HLL sketches differ across engines — correctness bound is a
    // ScalaTest (within rsd of exact); driver records rows-only.
    QueryDef.noOracle("q_agg_approx_hll") { (s, d) =>
      Tables.events(s, d).groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type")
    },

    QueryDef("q_agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag, l_linestatus) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"),
          sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    QueryDef("q_agg_stats",
      """WITH c AS (
        |  SELECT c_nationkey, c_acctbal,
        |         CAST(round(c_acctbal*100) AS BIGINT) AS cents
        |  FROM customer
        |)
        |SELECT c_nationkey, count(*) AS n,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |  round(sqrt(CAST(CAST(count(*)*sum(cents*cents) - sum(cents)*sum(cents) AS STRING) AS DOUBLE)
        |        / CAST(count(*)*(count(*)-1) AS DOUBLE)) / 100.0, 4) AS std_bal,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal
        |FROM c GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      // n·Σx² − (Σx)² is computed in DECIMAL(38,0): the per-term square
      // fits int64 (|cents| < 3e9) but the PRODUCT n·Σx² crosses 2^63
      // once n·Σx² ≳ 9.2e18 — observed at the 10× rows-replica of sf0.1
      // (6k customers/nation × cents² ≈ 2.4e15 sums, ×n ≈ 1.4e19;
      // round-12 ScaleVerify find). DuckDB is immune (HUGEINT
      // accumulation); decimal-first on the Spark side keeps both
      // engines exact to ~1e38, and the final cast-to-double of the
      // same exact integer is bit-identical (§7.4).
      Tables.customer(s, d)
        .withColumn("cents", expr("CAST(round(c_acctbal*100) AS BIGINT)"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"),
          sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("s2"),
          sum(col("cents").cast("decimal(38,0)")).as("s1"),
          expr("round(percentile(c_acctbal, 0.5), 4)").as("median_bal"))
        .select(col("c_nationkey"), col("n"), col("min_bal"), col("max_bal"),
          round(sqrt((col("n").cast("decimal(38,0)") * col("s2") -
              col("s1") * col("s1")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")) / lit(100.0), 4).as("std_bal"),
          col("median_bal"))
        .orderBy("c_nationkey")
    },

    QueryDef("q_agg_histogram",
      """SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(expr("CAST(floor(l_extendedprice / 1000) AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).cast("double").as("qty"))
        .orderBy("bucket")
    },

    QueryDef("q_agg_collect",
      MeasurementsSql +
      """
        |SELECT user_id,
        |  array_to_string(list(event_id ORDER BY ts_us, event_id), ',') AS ids
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      // collect_list order is undefined under parallel merge — sort the
      // collected (ts, id) structs, then project ids (SURVEY.md §7.4).
      // Joined to a string: list-typed output columns crash the driver's
      // pandas sort_values; int formatting is engine-identical.
      Tables.measurements(s, d)
        .groupBy("user_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("ts_us"), col("event_id")))),
          x => x.getField("event_id")), ",").as("ids"))
        .orderBy("user_id")
    },

    QueryDef("q_agg_bool_bitwise",
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.05) AS any_disc,
        |  CAST(bit_and(l_orderkey) AS BIGINT) AS band,
        |  CAST(bit_or(l_orderkey) AS BIGINT) AS bor,
        |  CAST(bit_xor(l_orderkey) AS BIGINT) AS bxor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // boolean/bitwise aggregate surface — all order-insensitive
      // monoids, so partial aggregation is exact by construction
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("bool_and(l_quantity > 0)").as("all_pos"),
          expr("bool_or(l_discount > 0.05)").as("any_disc"),
          expr("CAST(bit_and(l_orderkey) AS BIGINT)").as("band"),
          expr("CAST(bit_or(l_orderkey) AS BIGINT)").as("bor"),
          expr("CAST(bit_xor(l_orderkey) AS BIGINT)").as("bxor"))
        .orderBy("l_returnflag")
    },

    QueryDef("q_udaf_wmean",
      MeasurementsSql +
      """,
        |wt AS (
        |  SELECT user_id, event_type, cents,
        |         lead(ts_us) OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts_us, event_id) - ts_us AS w_us
        |  FROM m
        |)
        |SELECT user_id, event_type,
        |  CAST(CAST(sum(CAST(cents AS HUGEINT)*w_us) AS STRING) AS DOUBLE) / CAST(sum(w_us) AS DOUBLE) / 100.0 AS wmean
        |FROM wt WHERE w_us IS NOT NULL
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      Util.requireLoudOverflow(s)
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val wt = Tables.measurements(s, d)
        .withColumn("w_us", lead("ts_us", 1).over(w) - col("ts_us"))
        .filter(col("w_us").isNotNull)
        .groupBy("user_id", "event_type")
      // default: the typed Aggregator — exact Long monoid whose
      // Math.multiplyExact fails LOUDLY past |cents·w_us| ≥ 2^63 (JVM
      // arithmetic never passes through ANSI, round 12). Wide: the
      // same exact quotient with DECIMAL(38,0)/HUGEINT products — an
      // Aggregator buffer can't carry >1e20 integers (product-encoder
      // decimals cap at (38,18)), so the wide path IS the Catalyst
      // decimal aggregation; Σw_us stays int64 (a series' covered µs
      // span always fits). Both emit one double division.
      val agged =
        if (Util.wideMoments(s))
          wt.agg((sum(col("cents").cast("decimal(19,0)") * col("w_us"))
              .cast("double") / sum(col("w_us")).cast("double") / 100.0)
            .as("wmean"))
        else {
          val twMean = udaf(new TimeWeightedMean)
          wt.agg(twMean(col("cents"), col("w_us")).as("wmean"))
        }
      agged.orderBy("user_id", "event_type")
    },

    QueryDef("q_agg_salted",
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_l_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // two-phase salted aggregation — partial per (key, salt), final
      // per key: a hot group spreads across 8 tasks before the final
      // 8-rows-per-group reduce. Exact BIGINT sums keep the monoid
      // bit-deterministic; the oracle is the plain one-phase sum, which
      // the salted plan must equal by associativity
      graft.operators.JoinOps.saltedSum(
          Tables.lineitem(s, d)
            .select(col("l_returnflag"), col("l_quantity").cast("bigint").as("l_qty")),
          Seq("l_returnflag"), "l_qty", col("l_qty"), nSalts = 8)
        .select(col("l_returnflag"), col("sum_l_qty").cast("bigint").as("sum_l_qty"))
        .orderBy("l_returnflag")
    },

    QueryDef("q_agg_string_agg",
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // ordered string aggregation (the group-members report column):
      // DISTINCT + explicit ORDER is what makes it deterministic under
      // any partial-agg schedule — collect_set's order is undefined, so
      // the sort happens explicitly before joining
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",")
            .as("statuses"),
          countDistinct("l_linestatus").as("n_statuses"))
        .orderBy("l_returnflag")
    },

    QueryDef("q_agg_median_exact",
      """WITH c AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents, event_id
        |  FROM events
        |), r AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN rn = (n+1)//2 OR rn = (n+2)//2 THEN cents END) AS DOUBLE)
        |    / CAST(count(CASE WHEN rn = (n+1)//2 OR rn = (n+2)//2 THEN 1 END) AS DOUBLE)
        |    / 100.0 AS median
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // EXACT per-group median via explicit middle-rank selection —
      // builtin interpolating percentiles differ across engines at the
      // last ulp (different a+(b-a)g vs (1-g)a+gb formulas), so the
      // midpoint is computed the same way in both: integer cents at
      // the middle rank(s), one exact sum, one division. The window
      // ranks within each group partition — at scale this is the
      // standard sort-based exact quantile, one shuffle by group
      val c = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(round(value*100) AS BIGINT)").as("cents"), col("event_id"))
      val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
      val wn = Window.partitionBy("event_type")
      c.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n+1) div 2") || col("rn") === expr("(n+2) div 2"))
        .groupBy("event_type")
        .agg((sum("cents").cast("double") / count(lit(1)).cast("double")
          / lit(100.0)).as("median"))
        .orderBy("event_type")
    },

    QueryDef("q_agg_mode",
      """WITH c AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents,
        |         count(*) AS cnt
        |  FROM events GROUP BY event_type, cents
        |), r AS (
        |  SELECT event_type, cents, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY cnt DESC, cents ASC) AS rn
        |  FROM c
        |)
        |SELECT event_type, cents AS mode_cents, CAST(cnt AS BIGINT) AS n
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      // exact per-group mode with a DETERMINISTIC tie-break (highest
      // count, then smallest value — builtin `mode` is free to pick any
      // tied value, which would never oracle-match). Shape at scale:
      // the count agg shrinks each group to its distinct values before
      // the window sees anything, and the window partitions by the
      // same key — 2 shuffles, both over the reduced distinct-value set
      val counts = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(round(value*100) AS BIGINT)").as("cents"))
        .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("cnt").desc, col("cents").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("cents").as("mode_cents"),
          col("cnt").as("n"))
        .orderBy("event_type")
    },

    QueryDef("q_agg_cube",
      """SELECT lang, source, grouping(lang, source) AS gid,
        |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin) { (s, d) =>
      // full CUBE lattice (all 4 grouping sets) in ONE pass — Catalyst
      // expands to Expand + a single hash agg, so the raw table is read
      // once however many sets the lattice has; grouping_id disambiguates
      // rolled-up NULLs from data NULLs (same bit order as DuckDB's
      // grouping(), pinned already by q_agg_grouping_sets). BIGINT sums
      // stay exact under any partial-agg order
      Tables.documents(s, d)
        .cube("lang", "source")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum("n_chars").as("sum_chars"))
        .select("lang", "source", "gid", "n", "sum_chars")
        .orderBy(col("gid"), col("lang").asc_nulls_first,
          col("source").asc_nulls_first)
    },

    QueryDef("q_agg_filtered",
      """SELECT event_type,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE value >= 50) AS n_hi,
        |  CAST(sum(CAST(round(value*100) AS BIGINT))
        |       FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS even_cents,
        |  count(DISTINCT user_id) FILTER (WHERE value < 10) AS low_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // ANSI FILTER-clause aggregates: four differently-predicated
      // aggregates share ONE scan and one shuffle (the alternative —
      // four filtered self-aggregations unioned — reads the table four
      // times). count-distinct-with-filter exercises the expand path;
      // the conditional sum stays exact-integer. An empty filter group
      // yields NULL in both engines
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          expr("count(*) FILTER (WHERE value >= 50)").as("n_hi"),
          expr("""CAST(sum(CAST(round(value*100) AS BIGINT))
                 FILTER (WHERE user_id % 2 = 0) AS BIGINT)""").as("even_cents"),
          expr("count(DISTINCT user_id) FILTER (WHERE value < 10)").as("low_users"))
        .orderBy("event_type")
    },

    QueryDef("q_agg_percentile_cont",
      """WITH c AS (SELECT event_type,
        |    CAST(round(value*100) AS BIGINT) AS cents FROM events)
        |SELECT event_type,
        |  quantile_cont(cents, 0.25) AS p25,
        |  quantile_cont(cents, 0.50) AS p50,
        |  quantile_cont(cents, 0.75) AS p75
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // ANSI percentile_cont (linear interpolation between ranks) —
      // completes the quantile surface next to nearest-rank
      // (q_store_rollup_quantile), exact-median (q_agg_median_exact),
      // and the sketch family. DYADIC quantiles only (like
      // q_store_rollup_quantile_cont): f = frac((n−1)·q) is an exact
      // 2-bit dyadic, cents are exact small integers, so BOTH
      // interpolation forms ((1−f)·lo+f·hi vs lo+(hi−lo)·f) evaluate
      // exactly and cross-engine bit-equal with no rounding crutch —
      // a non-dyadic q (0.95) can differ by an ulp between the forms
      // and then round() itself flips at a x.xxxx5 boundary. One
      // shuffle, sort within each (small) group.
      Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(round(value*100) AS BIGINT)").as("cents"))
        .groupBy("event_type")
        .agg(
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY cents)").as("p25"),
          expr("percentile_cont(0.50) WITHIN GROUP (ORDER BY cents)").as("p50"),
          expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY cents)").as("p75"))
        .orderBy("event_type")
    },

    QueryDef("q_agg_skew",
      s"""WITH c AS (SELECT event_type,
        |    CAST(round(value*100) AS BIGINT) AS x FROM events),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(CAST(sum(CAST(x AS HUGEINT)*x) AS STRING) AS DOUBLE) AS s2,
        |    CAST(CAST(sum(CAST(x AS HUGEINT)*x*x) AS STRING) AS DOUBLE) AS s3,
        |    CAST(min(x) AS BIGINT) AS mn, CAST(max(x) AS BIGINT) AS mx
        |  FROM c GROUP BY event_type
        |)
        |SELECT event_type, n, ${AggQueries.skewSql} AS skew
        |FROM a ORDER BY event_type""".stripMargin) { (s, d) =>
      // population skewness from raw moments — the third-moment member
      // of the §7.4 moment pattern (corr/autocorr are its second-moment
      // siblings): Σx and Σx² accumulate as exact BIGINT; Σx³ per-row
      // products fit int64 (cents ≤ 5.7e4 ⇒ x³ ≤ 1.9e14) but the GROUP
      // sum does not at sf ≥ 0.1, so the whole cube is DECIMAL-first:
      // Spark casts the FIRST factor to decimal(12,0) before
      // multiplying (mirroring the oracle's CAST(x AS HUGEINT)*x*x),
      // so no int64 intermediate exists and nothing can silently wrap
      // even if a future fixture pushes |cents| past the 2.09e6 bound
      // where x³ leaves int64; the sum accumulates in DECIMAL(38,0)
      // (Spark) / HUGEINT (DuckDB) — both exact, both then correctly
      // rounded once to the SAME double. The projection (generated
      // once, evaluated verbatim by both engines) uses d·sqrt(d) for
      // the 3/2 power — sqrt and the arithmetic ops are
      // correctly-rounded IEEE, while pow(x, 1.5) is NOT guaranteed
      // bit-identical across math libraries and is banned here. Skew
      // emitted UNROUNDED; zero-variance groups fall to NULL.
      Util.requireLoudOverflow(s)
      Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(round(value*100) AS BIGINT)").as("x"))
        .groupBy("event_type")
        // s1/s2 joined s3 in decimal accumulation (the §7.4 group-size
        // rule, round 12): their int64 sums were safe at fixture group
        // sizes but grow with corpus rows per event_type. s2's PER-TERM
        // x·x stays int64 by default (|x| < 3.0e9 bound, ANSI-loud
        // past it) and goes decimal-first under
        // spark.graft.wideMoments (round 13; the oracle's x·x is
        // HUGEINT-first unconditionally, so it is exact either way)
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).cast("double").as("s1"),
          sum(Util.momentProd(s)(col("x"), col("x")))
            .cast("double").as("s2"),
          sum(col("x").cast("decimal(12,0)") * col("x") * col("x"))
            .cast("double").as("s3"),
          min("x").as("mn"), max("x").as("mx"))
        .select(col("event_type"), col("n"), expr(AggQueries.skewSql).as("skew"))
        .orderBy("event_type")
    }
  )

  /** q_agg_skew's projection over (n, s1, s2, s3, mn, mx) — generated
    * once and evaluated verbatim by both engines (the acfCaseSql
    * pattern): g₁ = √n · (n²·s3 − 3n·s1·s2 + 2·s1³) / (n·s2 − s1²)^{3/2},
    * the 3/2 power written d·√d because sqrt is correctly-rounded IEEE
    * everywhere and pow is not. The zero-variance gate is the EXACT
    * integer test mn < mx — the double d = n·s2 − s1² stops being an
    * exact zero detector once the sums exceed 2^53 (a constant group
    * would emit garbage through a rounding-created tiny d) — with
    * d > 0 kept as the numeric guard so a pathological rounded-negative
    * d can never reach sqrt. */
  def skewSql: String = {
    val d = "(CAST(n AS DOUBLE) * s2 - s1 * s1)"
    val num = "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * s3 " +
      "- 3 * CAST(n AS DOUBLE) * s1 * s2 + 2 * s1 * s1 * s1)"
    s"CASE WHEN mn < mx AND $d > 0 THEN sqrt(CAST(n AS DOUBLE)) * $num / ($d * sqrt($d)) END"
  }
}
