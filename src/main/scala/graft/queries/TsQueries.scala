package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables, Util}
import graft.operators.TimeSeriesOps
import graft.Tables.MeasurementsSql

/** SURVEY.md §2 A–C: scans, filters, projections, and the time-series
  * core (the reference-defining semantics). Every oracle is written
  * textually parallel to the Spark expression (SURVEY.md §7.4):
  * integer math until the final projection, identical IEEE double
  * arithmetic both sides, total ORDER BY on unique keys.
  */
object TsQueries {

  private val Step6 = 21600L          // 6 h consolidation step (seconds)
  private val Day = 86400L
  private val HbUs = 21600L * 1000000L // heartbeat: 6 h in µs
  private val GridB = 1704067200L     // 2024-01-01T00:00:00Z
  private val GridE = 1706659200L     // 2024-01-31T00:00:00Z

  val all: Seq[QueryDef] = Seq(

    // ---- A. scans / sources --------------------------------------------
    QueryDef("q_scan_parquet",
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber") { (s, d) =>
      Tables.lineitem(s, d).orderBy("l_orderkey", "l_linenumber")
    },

    QueryDef("q_scan_pruned",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    QueryDef("q_source_json",
      """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // round 18: sort FIRST on the narrow key, extract the JSON path
      // after — same rangepartitioning-samples-its-child fix as
      // q_map_json_funcs (guide §1/§2.4); the parse runs once, not per
      // boundary-sampling pass
      Tables.events(s, d)
        .select("event_id", "props")
        .orderBy("event_id")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // ---- B. filter / project ------------------------------------------
    QueryDef("q_filter_time_range",
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM events
        |WHERE epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705708800000000
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.eventsInRange(s, d, 1704844800000000L, 1705708800000000L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .orderBy("event_id")
    },

    QueryDef("q_filter_series_path",
      """SELECT event_id, epoch_us(ts) AS ts_us, value FROM events
        |WHERE user_id = 7 AND event_type = 'click'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") === 7 && col("event_type") === "click")
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
        .orderBy("event_id")
    },

    QueryDef("q_project_arith",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |       AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).selectExpr("l_orderkey", "l_linenumber",
          """CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
            |     (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
            |     AS DECIMAL(18,4)) AS DOUBLE) AS revenue""".stripMargin)
        .orderBy("l_orderkey", "l_linenumber")
    },

    QueryDef("q_case_expr",
      """SELECT o_orderkey,
        |  CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
        |       ELSE 'pending' END AS status_label,
        |  CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).selectExpr("o_orderkey",
          """CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
            |     ELSE 'pending' END AS status_label""".stripMargin,
          "CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent")
        .orderBy("o_orderkey")
    },

    // ---- C. time-series core ------------------------------------------
    QueryDef("q_ts_slot_align",
      MeasurementsSql +
      """
        |SELECT event_id, ts_us, (ts_us // 21600000000) * 21600 AS slot_ts
        |FROM m ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.measurements(s, d)
        .select(col("event_id"), col("ts_us"), TimeSeriesOps.slotSec(Step6).as("slot_ts"))
        .orderBy("event_id")
    },

    QueryDef("q_ts_rate_counter",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT event_id, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |)
        |SELECT event_id,
        |  ((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS delta_cents,
        |  ts_us - prev_ts_us AS dt_us,
        |  CASE WHEN ts_us - prev_ts_us > 0 THEN
        |    (CAST(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS DOUBLE) / 100.0)
        |    / (CAST(ts_us - prev_ts_us AS DOUBLE) / 1000000.0) END AS rate
        |FROM r ORDER BY event_id""".stripMargin) { (s, d) =>
      TimeSeriesOps.withRate(s, Tables.measurements(s, d))
        .select("event_id", "delta_cents", "dt_us", "rate")
        .orderBy("event_id")
    },

    QueryDef("q_ts_counter_stats",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, wrapped,
        |         lag(wrapped) OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts_us, event_id) AS prev_wrapped
        |  FROM m
        |)
        |SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(count(CASE WHEN wrapped < prev_wrapped THEN 1 END) AS BIGINT) AS n_wraps,
        |  CAST(sum(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000) AS BIGINT) AS total_delta
        |FROM r GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // per-series counter health: sample count, observed 32-bit-style
      // wrap events (raw decrease ⇒ wrap under monotone counters), and
      // the wrap-corrected total movement — the poller-health summary
      // the reference's status pages derive from MAX_TIMESTAMP + deltas
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      Tables.measurements(s, d)
        .withColumn("prev_wrapped", lag("wrapped", 1).over(w))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_samples"),
          count(when(col("wrapped") < col("prev_wrapped"), 1)).as("n_wraps"),
          sum(expr("((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000"))
            .cast("bigint").as("total_delta"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_heartbeat",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT event_id, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |)
        |SELECT event_id, (ts_us - prev_ts_us) <= 21600000000 AS valid,
        |  CASE WHEN (ts_us - prev_ts_us) <= 21600000000 THEN
        |    CASE WHEN ts_us - prev_ts_us > 0 THEN
        |      (CAST(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS DOUBLE) / 100.0)
        |      / (CAST(ts_us - prev_ts_us AS DOUBLE) / 1000000.0) END END AS rate_hb
        |FROM r ORDER BY event_id""".stripMargin) { (s, d) =>
      TimeSeriesOps.withHeartbeat(
          TimeSeriesOps.withRate(s, Tables.measurements(s, d)), Step6)
        .select("event_id", "valid", "rate_hb")
        .orderBy("event_id")
    },

    QueryDef("q_ts_downsample_avg",
      MeasurementsSql +
      """
        |SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |  count(*) AS n,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_val
        |FROM m GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      TimeSeriesOps.downsample(Tables.measurements(s, d), Step6)
        .select(col("user_id"), col("event_type"), col("slot_ts"), col("n"),
          (col("sum_cents").cast("double") / lit(100.0) / col("n").cast("double")).as("avg_val"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_downsample_minmax",
      MeasurementsSql +
      """
        |SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |  CAST(min(cents) AS DOUBLE) / 100.0 AS min_val,
        |  CAST(max(cents) AS DOUBLE) / 100.0 AS max_val
        |FROM m GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      TimeSeriesOps.downsample(Tables.measurements(s, d), Step6)
        .select(col("user_id"), col("event_type"), col("slot_ts"),
          (col("min_cents").cast("double") / lit(100.0)).as("min_val"),
          (col("max_cents").cast("double") / lit(100.0)).as("max_val"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_delta_sum",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |)
        |SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |  CAST(sum(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000) AS BIGINT) AS sum_delta_cents,
        |  CAST(sum(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000) AS DOUBLE) / 100.0 AS delta_val
        |FROM r
        |WHERE prev_ts_us IS NOT NULL AND (ts_us - prev_ts_us) <= 21600000000
        |GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      TimeSeriesOps.withRate(s, Tables.measurements(s, d))
        .filter(col("prev_ts_us").isNotNull && col("dt_us") <= HbUs)
        .groupBy(col("user_id"), col("event_type"), TimeSeriesOps.slotSec(Step6).as("slot_ts"))
        .agg(sum("delta_cents").as("sum_delta_cents"))
        .withColumn("delta_val", col("sum_delta_cents").cast("double") / lit(100.0))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_multires",
      MeasurementsSql +
      """,
        |h AS (
        |  SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |         count(*) AS n, sum(cents) AS sum_cents
        |  FROM m GROUP BY 1, 2, 3
        |)
        |SELECT user_id, event_type, (slot_ts // 86400) * 86400 AS day_ts,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(sum_cents) AS DOUBLE) / 100.0 / CAST(sum(n) AS DOUBLE) AS avg_val
        |FROM h GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, day_ts""".stripMargin) { (s, d) =>
      // coarser level computed FROM the finer level, not from raw rows —
      // the reference's aggregate-from-aggregate cascade
      TimeSeriesOps.downsample(Tables.measurements(s, d), Step6)
        .groupBy(col("user_id"), col("event_type"),
          (expr(s"slot_ts div $Day") * Day).as("day_ts"))
        .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"))
        .select(col("user_id"), col("event_type"), col("day_ts"), col("n"),
          (col("sum_cents").cast("double") / lit(100.0) / col("n").cast("double")).as("avg_val"))
        .orderBy("user_id", "event_type", "day_ts")
    },

    QueryDef("q_ts_gap_fill",
      MeasurementsSql +
      """,
        |h AS (
        |  SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |         count(*) AS n, sum(cents) AS sum_cents
        |  FROM m GROUP BY 1, 2, 3
        |)
        |SELECT s.user_id, s.event_type, g.slot_ts,
        |  coalesce(h.n, 0) AS n,
        |  CAST(h.sum_cents AS DOUBLE) / 100.0 AS slot_val
        |FROM (SELECT DISTINCT user_id, event_type FROM m) s
        |CROSS JOIN range(1704067200, 1706659200, 21600) g(slot_ts)
        |LEFT JOIN h ON h.user_id = s.user_id AND h.event_type = s.event_type
        |           AND h.slot_ts = g.slot_ts
        |ORDER BY s.user_id, s.event_type, g.slot_ts""".stripMargin) { (s, d) =>
      TimeSeriesOps.gapFill(s, Tables.measurements(s, d), GridB, GridE, Step6)
        .select(col("user_id"), col("event_type"), col("slot_ts"),
          coalesce(col("n"), lit(0L)).as("n"),
          (col("sum_cents").cast("double") / lit(100.0)).as("slot_val"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_gap_interp",
      MeasurementsSql +
      """,
        |h AS (
        |  SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |         sum(cents) AS sum_cents
        |  FROM m GROUP BY 1, 2, 3
        |),
        |gf AS (
        |  SELECT s.user_id, s.event_type, g.slot_ts,
        |    CAST(h.sum_cents AS DOUBLE) / 100.0 AS slot_val
        |  FROM (SELECT DISTINCT user_id, event_type FROM m) s
        |  CROSS JOIN range(1704067200, 1706659200, 21600) g(slot_ts)
        |  LEFT JOIN h ON h.user_id = s.user_id AND h.event_type = s.event_type
        |             AND h.slot_ts = g.slot_ts
        |),
        |n AS (
        |  SELECT user_id, event_type, slot_ts, slot_val,
        |    max(CASE WHEN slot_val IS NOT NULL THEN slot_ts END) OVER wp AS prev_ts,
        |    last_value(slot_val IGNORE NULLS) OVER wp AS prev_val,
        |    min(CASE WHEN slot_val IS NOT NULL THEN slot_ts END) OVER wf AS next_ts,
        |    first_value(slot_val IGNORE NULLS) OVER wf AS next_val
        |  FROM gf
        |  WINDOW wp AS (PARTITION BY user_id, event_type ORDER BY slot_ts
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id, event_type ORDER BY slot_ts
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, event_type, slot_ts,
        |  CASE WHEN slot_val IS NOT NULL THEN slot_val
        |       WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
        |       ELSE prev_val + (next_val - prev_val) *
        |            (CAST(slot_ts - prev_ts AS DOUBLE) / CAST(next_ts - prev_ts AS DOUBLE))
        |  END AS val
        |FROM n ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      // linear interpolation over the dense slot grid: empty slots take
      // prev + (next-prev)·(t-t_prev)/(t_next-t_prev) from the nearest
      // valid neighbours per series (edges stay NULL — no extrapolation).
      // Two frame-bounded window passes; per-row arithmetic only, so
      // bit-deterministic under any partitioning. UNROUNDED output:
      // interpolated midpoints sit exactly on .00005 half-boundaries
      // where engine round() implementations disagree; the identical
      // IEEE expression tree is already bit-equal (§7.4). The
      // reference's heartbeat semantics stay NULL (q_ts_heartbeat);
      // this is the generalized resample a consumer opts into.
      // both neighbor lookups are RUNNING frames: the forward-looking
      // neighbor comes from a running frame over DESCENDING slot order,
      // not a [currentRow, unboundedFollowing] frame — Spark evaluates
      // shrinking frames by recomputing the aggregate per row (O(n²)
      // per series on the dense grid, the old 6.6-7.7 s hot spot) while
      // running frames accumulate in O(n). Same partitioning, so still
      // one exchange; the extra in-partition sort is n·log n.
      val wp = Window.partitionBy("user_id", "event_type").orderBy(col("slot_ts").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id", "event_type").orderBy(col("slot_ts").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // round 18: the round-17 pre-sort persist is GONE. gapFill now
      // plants RangePartitioning(user_id, event_type) below its map-agg,
      // which satisfies both the windows' ClusteredDistribution AND the
      // final orderBy's OrderedDistribution prefix — so the orderBy
      // plans as a LOCAL sort with no Exchange rangepartitioning above
      // this tail, and the boundary-sampling pass that used to
      // re-execute the double-window tail (the reason the persist
      // existed; it still read 15.7 s on the driver's cold 32-core run)
      // no longer exists at all. No cache, one fewer exchange.
      TimeSeriesOps.gapFill(s, Tables.measurements(s, d), GridB, GridE, Step6)
        .withColumn("slot_val", col("sum_cents").cast("double") / lit(100.0))
        .withColumn("prev_ts",
          max(when(col("slot_val").isNotNull, col("slot_ts"))).over(wp))
        .withColumn("prev_val", last("slot_val", ignoreNulls = true).over(wp))
        .withColumn("next_ts",
          min(when(col("slot_val").isNotNull, col("slot_ts"))).over(wf))
        .withColumn("next_val", last("slot_val", ignoreNulls = true).over(wf))
        .select(col("user_id"), col("event_type"), col("slot_ts"),
          when(col("slot_val").isNotNull, col("slot_val"))
            .when(col("prev_val").isNull || col("next_val").isNull, lit(null))
            .otherwise(col("prev_val") + (col("next_val") - col("prev_val")) *
              ((col("slot_ts") - col("prev_ts")).cast("double") /
               (col("next_ts") - col("prev_ts")).cast("double"))).as("val"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_last_value",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM m
        |)
        |SELECT user_id, event_type, ts_us, event_id,
        |  CAST(cents AS DOUBLE) / 100.0 AS last_val
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      TimeSeriesOps.lastValue(Tables.measurements(s, d))
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
          (col("cents").cast("double") / lit(100.0)).as("last_val"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_bulk_pivot",
      MeasurementsSql +
      """
        |SELECT user_id, (ts_us // 21600000000) * 21600 AS slot_ts,
        |  CAST(sum(cents) FILTER (WHERE event_type = 'click')    AS DOUBLE) / 100.0 AS click,
        |  CAST(sum(cents) FILTER (WHERE event_type = 'error')    AS DOUBLE) / 100.0 AS error,
        |  CAST(sum(cents) FILTER (WHERE event_type = 'purchase') AS DOUBLE) / 100.0 AS purchase,
        |  CAST(sum(cents) FILTER (WHERE event_type = 'signup')   AS DOUBLE) / 100.0 AS signup,
        |  CAST(sum(cents) FILTER (WHERE event_type = 'view')     AS DOUBLE) / 100.0 AS view
        |FROM m GROUP BY 1, 2
        |ORDER BY user_id, slot_ts""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.measurements(s, d)
        .groupBy(col("user_id"), TimeSeriesOps.slotSec(Step6).as("slot_ts"))
        .pivot("event_type", types).agg(sum("cents"))
        .select(col("user_id") +: col("slot_ts") +:
          types.map(t => (col(t).cast("double") / lit(100.0)).as(t)): _*)
        .orderBy("user_id", "slot_ts")
    },

    QueryDef("q_ts_delta_distribute",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT event_id, user_id, event_type, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |),
        |p AS (
        |  SELECT event_id, ts_us, prev_ts_us,
        |         ts_us - prev_ts_us AS dt_us,
        |         ((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS delta_cents,
        |         (prev_ts_us // 21600000000) * 21600 AS prev_slot,
        |         (ts_us // 21600000000) * 21600 AS cur_slot
        |  FROM r
        |  WHERE prev_ts_us IS NOT NULL AND ts_us - prev_ts_us > 0
        |    AND ts_us - prev_ts_us <= 21600000000
        |),
        |x AS (
        |  SELECT event_id, ts_us, prev_ts_us, dt_us, delta_cents,
        |         unnest(range(prev_slot, cur_slot + 21600, 21600)) AS slot_ts
        |  FROM p
        |)
        |SELECT event_id, slot_ts,
        |  least(ts_us, (slot_ts + 21600) * 1000000) - greatest(prev_ts_us, slot_ts * 1000000) AS overlap_us,
        |  CAST(delta_cents AS DOUBLE) / 100.0
        |    * CAST(least(ts_us, (slot_ts + 21600) * 1000000) - greatest(prev_ts_us, slot_ts * 1000000) AS DOUBLE)
        |    / CAST(dt_us AS DOUBLE) AS portion
        |FROM x ORDER BY event_id, slot_ts""".stripMargin) { (s, d) =>
      // the reference Aggregator's delta distribution: a sample pair
      // spanning several bins apportions its wrap-corrected delta to
      // each covered slot by time overlap [pub: tsdb/aggregator.py —
      // unverified, SURVEY.md §0]. Per-(pair,slot) rows stay exact;
      // only the final portion is a (deterministic) double ratio.
      val withSlots = TimeSeriesOps.withRate(s, Tables.measurements(s, d))
        .filter(col("prev_ts_us").isNotNull && col("dt_us") > 0 && col("dt_us") <= HbUs)
        .withColumn("prev_slot", expr("(prev_ts_us div 21600000000) * 21600"))
        .withColumn("cur_slot", expr("(ts_us div 21600000000) * 21600"))
        .withColumn("slot_ts",
          explode(sequence(col("prev_slot"), col("cur_slot"), lit(Step6))))
      val overlap = least(col("ts_us"), (col("slot_ts") + Step6) * 1000000L) -
        greatest(col("prev_ts_us"), col("slot_ts") * 1000000L)
      withSlots.select(col("event_id"), col("slot_ts"),
          overlap.as("overlap_us"),
          (col("delta_cents").cast("double") / lit(100.0) *
            overlap.cast("double") / col("dt_us").cast("double")).as("portion"))
        .orderBy("event_id", "slot_ts")
    },

    QueryDef("q_api_payload",
      MeasurementsSql +
      """,
        |h AS (
        |  SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |         CAST(sum(cents) AS BIGINT) AS sum_cents
        |  FROM m GROUP BY 1, 2, 3
        |)
        |SELECT user_id, event_type,
        |  to_json(struct_pack(
        |    agg := 21600, cf := 'sum', b := 1704067200, e := 1706659200,
        |    data := list([slot_ts, sum_cents] ORDER BY slot_ts))) AS payload
        |FROM h GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // the REST response encode [pub: esxsnmp/newdb.py JSON payload
      // {agg, cf, begin, end, data:[[ts,v],…]} — unverified]: integer-
      // only payload renders byte-identically in both engines
      TimeSeriesOps.downsample(Tables.measurements(s, d), Step6)
        .groupBy("user_id", "event_type")
        .agg(sort_array(collect_list(array(col("slot_ts"), col("sum_cents")))).as("data"))
        .select(col("user_id"), col("event_type"),
          to_json(struct(lit(21600).as("agg"), lit("sum").as("cf"),
            lit(1704067200).as("b"), lit(1706659200).as("e"),
            col("data").as("data"))).as("payload"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_meta_series_list",
      MeasurementsSql +
      """
        |SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us
        |FROM m GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // the TSDB's namespace listing + per-var MIN/MAX_TIMESTAMP
      // metadata [pub: TSDBVar metadata — unverified], derivable here
      // by one aggregation instead of a filesystem walk
      Tables.measurements(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_rows"),
          min("ts_us").as("min_ts_us"), max("ts_us").as("max_ts_us"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_insert_idempotent",
      MeasurementsSql +
      """
        |SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |  count(*) AS writes,
        |  CAST(arg_max(cents, event_id) AS DOUBLE) / 100.0 AS slot_val
        |FROM m GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      // offset-addressing semantics: last write (max arrival id) per slot wins
      Tables.measurements(s, d)
        .groupBy(col("user_id"), col("event_type"), TimeSeriesOps.slotSec(Step6).as("slot_ts"))
        .agg(count(lit(1)).as("writes"),
          (max_by(col("cents"), col("event_id")).cast("double") / lit(100.0)).as("slot_val"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_trend",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         epoch_us(ts) // 60000000 - 28401120 AS x,
        |         CAST(round(value*100) AS BIGINT) AS y
        |  FROM events),
        |a AS (SELECT user_id, event_type, count(*) AS n,
        |        sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
        |      FROM s GROUP BY user_id, event_type)
        |SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN
        |    CAST(CAST(n * sxy - sx * sy AS STRING) AS DOUBLE)
        |      / CAST(CAST(n * sxx - sx * sx AS STRING) AS DOUBLE)
        |  END AS slope_cents_per_min
        |FROM a ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // per-series OLS trend slope — the drift detector behind
      // capacity alerts. NOT regr_slope: builtin regression aggregates
      // accumulate doubles (partial-agg-order dependent); here every
      // sum is exact — x in minutes offset from 2024-01-01
      // (28401120 = 1704067200/60) keeps per-term products in int64,
      // and the sums + the n·sxy − sx·sy products accumulate in
      // DECIMAL(38,0) (the §7.4 group-size rule, round 12: they grow
      // with series LENGTH, mirroring the oracle's HUGEINT) — the
      // single double division at the end is deterministic.
      // Map-side-combined integer sums: one shuffle
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          (expr("unix_micros(ts) div 60000000") - 28401120L).as("x"),
          expr("CAST(round(value*100) AS BIGINT)").as("y"))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
        .select(col("user_id"), col("event_type"), col("n"),
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("slope_cents_per_min"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_ema",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |             CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT user_id, event_type,
        |        list(CAST(cents AS DOUBLE) ORDER BY ts_us, event_id) AS vs
        |      FROM s GROUP BY user_id, event_type)
        |SELECT user_id, event_type, CAST(len(vs) AS BIGINT) AS n,
        |  round(list_reduce(vs, (acc, x) -> 0.2 * x + 0.8 * acc) / 100.0, 4) AS ema
        |FROM l ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // per-series exponential moving average at the last sample
      // (α = 0.2, seeded with the first value) — the classic smoothing
      // the RRD world applies before alerting. The fold LOOKS
      // inherently sequential, but each EMA step is an affine map and
      // affine composition is associative, so it runs as the chunked
      // two-level form (TimeSeriesOps.emaChunked — VERDICT r5 wrong
      // #1: the old whole-series collect put a multi-year series into
      // one task array; chunking bounds task memory at chunkSize).
      // The regrouped doubles agree with DuckDB's sequential
      // list_reduce far inside the declared round(…, 4) — EmaSpec pins
      // the bound; this oracle pins the hash
      TimeSeriesOps.emaChunked(
          Tables.events(s, d)
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"), col("event_id"),
              expr("CAST(round(value*100) AS BIGINT)").cast("double").as("v")),
          alpha = 0.2, beta = 0.8)
        .select(col("user_id"), col("event_type"), col("n"),
          round(col("ema") / 100.0, 4).as("ema"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_sessionize",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events),
        |g AS (SELECT user_id, event_type, ts_us, event_id,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |               OR ts_us - lag(ts_us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM s WINDOW w AS (PARTITION BY user_id, event_type
        |                          ORDER BY ts_us, event_id)),
        |i AS (SELECT user_id, event_type, ts_us,
        |        sum(new_sess) OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM g)
        |SELECT user_id, event_type, CAST(sess_id AS BIGINT) AS sess_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts_us) AS BIGINT) AS sess_start,
        |  CAST(max(ts_us) AS BIGINT) AS sess_end
        |FROM i GROUP BY user_id, event_type, sess_id
        |ORDER BY user_id, event_type, sess_id""".stripMargin) { (s, d) =>
      // gap-based sessionization with explicit session IDS (the
      // complement of session_window's boundaries-only shape): a new
      // session starts after a >30 min silence; id = running count of
      // session starts. Both windows share one (series, ts) sort, the
      // session agg groups on the derived id — one shuffle + sort
      // total, all integer arithmetic
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val run = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("new_sess",
          when(lag("ts_us", 1).over(w).isNull ||
            col("ts_us") - lag("ts_us", 1).over(w) > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "event_type", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("sess_start"), max("ts_us").as("sess_end"))
        .orderBy("user_id", "event_type", "sess_id")
    },

    QueryDef("q_ts_availability",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events),
        |r AS (SELECT user_id, event_type, ts_us,
        |        ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY ts_us, event_id) AS gap
        |      FROM s)
        |SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(CASE WHEN gap <= 21600000000 THEN gap ELSE 0 END) AS BIGINT)
        |    AS covered_us,
        |  CASE WHEN max(ts_us) > min(ts_us) THEN
        |    CAST(sum(CASE WHEN gap <= 21600000000 THEN gap ELSE 0 END) AS DOUBLE)
        |      / CAST(max(ts_us) - min(ts_us) AS DOUBLE) END AS availability
        |FROM r GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // per-series availability, the poller-SLA report the reference's
      // heartbeat semantics exist for: a span between consecutive
      // samples counts as covered only when it's within the heartbeat;
      // availability = covered time / observed span. One window pass +
      // one agg, both partitioned by series — no extra shuffle, and the
      // exact-integer sums divide once at the end (deterministic
      // double, §7.4)
      val hb = 21600000000L
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(w))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_samples"),
          coalesce(sum(when(col("gap") <= hb, col("gap")).otherwise(0L)), lit(0L))
            .as("covered_us"),
          (max("ts_us") - min("ts_us")).as("span_us"))
        .select(col("user_id"), col("event_type"), col("n_samples"),
          col("covered_us"),
          when(col("span_us") > 0,
            col("covered_us").cast("double") / col("span_us").cast("double"))
            .as("availability"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_p95_billing",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, event_id, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |),
        |v AS (
        |  SELECT user_id, event_type, event_id,
        |    (CAST(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS DOUBLE) / 100.0)
        |      / (CAST(ts_us - prev_ts_us AS DOUBLE) / 1000000.0) AS rate
        |  FROM r
        |  WHERE prev_ts_us IS NOT NULL
        |    AND ts_us - prev_ts_us > 0 AND ts_us - prev_ts_us <= 21600000000
        |),
        |k AS (
        |  SELECT user_id, event_type, event_id, rate,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY rate, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type) AS n
        |  FROM v
        |)
        |SELECT user_id, event_type, CAST(n AS BIGINT) AS n_rates, rate AS p95_rate
        |FROM k WHERE rn = (95*n + 99) // 100
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // 95th-percentile billing — THE canonical network-operator
      // computation on SNMP counter data (burstable billing ranks the
      // period's 5-min rates and bills the 95th). NEAREST-RANK exact
      // percentile: rank ceil(0.95·n) selected by row_number over
      // (rate, event_id) — no interpolation formula to disagree across
      // engines, the answer is one double already present in the data.
      // Heartbeat-valid deltas only, same wrap arithmetic as the rate
      // cascade. At scale: one window shuffle by series for the lag,
      // one for the ranking — the standard sort-based exact quantile;
      // a 100 TB deployment ranks within (series, billing-month)
      // partitions so no single sort exceeds one series-month
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val v = Tables.measurements(s, d)
        .withColumn("prev_wrapped", lag("wrapped", 1).over(w))
        .withColumn("prev_ts_us", lag("ts_us", 1).over(w))
        .filter(col("prev_ts_us").isNotNull &&
          col("ts_us") - col("prev_ts_us") > 0 &&
          col("ts_us") - col("prev_ts_us") <= HbUs)
        .withColumn("rate",
          expr("""(CAST(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS DOUBLE) / 100.0)
                 | / (CAST(ts_us - prev_ts_us AS DOUBLE) / 1000000.0)""".stripMargin))
      val wr = Window.partitionBy("user_id", "event_type").orderBy("rate", "event_id")
      val wn = Window.partitionBy("user_id", "event_type")
      v.withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(95*n + 99) div 100"))
        .select(col("user_id"), col("event_type"),
          col("n").as("n_rates"), col("rate").as("p95_rate"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_busy_hour",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |),
        |h AS (
        |  SELECT user_id, event_type,
        |    ts_us // 86400000000 AS day_no,
        |    (ts_us // 3600000000) % 24 AS hour_utc,
        |    sum(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000) AS hour_delta
        |  FROM r
        |  WHERE prev_ts_us IS NOT NULL
        |    AND ts_us - prev_ts_us > 0 AND ts_us - prev_ts_us <= 21600000000
        |  GROUP BY 1, 2, 3, 4
        |),
        |k AS (
        |  SELECT user_id, event_type, day_no, hour_utc, hour_delta,
        |    row_number() OVER (PARTITION BY user_id, event_type, day_no
        |                       ORDER BY hour_delta DESC, hour_utc) AS rn
        |  FROM h
        |)
        |SELECT user_id, event_type, CAST(day_no AS BIGINT) AS day_no,
        |  CAST(hour_utc AS BIGINT) AS busy_hour, CAST(hour_delta AS BIGINT) AS hour_delta
        |FROM k WHERE rn = 1
        |ORDER BY user_id, event_type, day_no""".stripMargin) { (s, d) =>
      // telecom busy hour: per series per UTC day, the hour with the
      // largest heartbeat-valid traffic (wrap-corrected delta sum); tie
      // breaks to the earliest hour. Exact integer cents throughout.
      // Shuffle shape at scale: the lag window by series, then a
      // map-side-combined hourly agg, then a top-1 window over ≤24 rows
      // per (series, day) group — nothing grows with sample rate after
      // the hourly rollup
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val h = Tables.measurements(s, d)
        .withColumn("prev_wrapped", lag("wrapped", 1).over(w))
        .withColumn("prev_ts_us", lag("ts_us", 1).over(w))
        .filter(col("prev_ts_us").isNotNull &&
          col("ts_us") - col("prev_ts_us") > 0 &&
          col("ts_us") - col("prev_ts_us") <= HbUs)
        .withColumn("day_no", expr("ts_us div 86400000000"))
        .withColumn("hour_utc", expr("(ts_us div 3600000000) % 24"))
        .groupBy("user_id", "event_type", "day_no", "hour_utc")
        .agg(sum(expr("((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000"))
          .as("hour_delta"))
      val wk = Window.partitionBy("user_id", "event_type", "day_no")
        .orderBy(col("hour_delta").desc, col("hour_utc"))
      h.withColumn("rn", row_number().over(wk))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("day_no").cast("bigint").as("day_no"),
          col("hour_utc").cast("bigint").as("busy_hour"),
          col("hour_delta").cast("bigint").as("hour_delta"))
        .orderBy("user_id", "event_type", "day_no")
    },

    QueryDef("q_ts_seasonal_baseline",
      """WITH m AS (
        |  SELECT event_type, epoch_us(ts) AS ts_us,
        |         CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events
        |),
        |h AS (
        |  SELECT event_type,
        |    ts_us // 3600000000 AS hour_no,
        |    (ts_us // 3600000000) % 24 AS hour_utc,
        |    sum(cents) AS cents_h
        |  FROM m GROUP BY 1, 2, 3
        |),
        |b AS (
        |  SELECT event_type, hour_no, hour_utc, cents_h,
        |    sum(cents_h) OVER (PARTITION BY event_type, hour_utc) AS base_s1,
        |    count(*) OVER (PARTITION BY event_type, hour_utc) AS base_n
        |  FROM h
        |)
        |SELECT event_type, CAST(hour_no AS BIGINT) AS hour_no,
        |  CAST(hour_utc AS BIGINT) AS hour_utc, CAST(cents_h AS BIGINT) AS cents_h,
        |  CAST(base_n AS BIGINT) AS base_n, CAST(base_s1 AS BIGINT) AS base_s1,
        |  CAST(cents_h AS DOUBLE) * CAST(base_n AS DOUBLE) / CAST(base_s1 AS DOUBLE)
        |    AS lift
        |FROM b
        |WHERE base_n > 1 AND cents_h * base_n > 2 * base_s1
        |ORDER BY event_type, hour_no""".stripMargin) { (s, d) =>
      // seasonal-baseline deviation — the network-weather-map view the
      // reference's consumers build on top of the raw fetch: each
      // metric's hourly traffic vs that metric's hour-of-day profile
      // over the whole period, flagging hours running >2× their
      // seasonal norm. The threshold is an EXACT integer cross-multiply
      // (cents_h·n > 2·Σ) so the cut is bit-deterministic; the double
      // `lift` only decorates rows that already passed. Shuffle shape
      // at scale: one map-side-combined hourly rollup (nothing after it
      // grows with sample rate), then a window over ≤days rows per
      // (metric, hour-of-day) — at 100 TB the rollup is the only pass
      // that sees raw data, and it prunes to the scanned columns
      val h = Tables.events(s, d)
        .select(col("event_type"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("hour_no", expr("ts_us div 3600000000"))
        .withColumn("hour_utc", expr("(ts_us div 3600000000) % 24"))
        .groupBy("event_type", "hour_no", "hour_utc")
        .agg(sum("cents").as("cents_h"))
      val wb = Window.partitionBy("event_type", "hour_utc")
      h.withColumn("base_s1", sum("cents_h").over(wb))
        .withColumn("base_n", count(lit(1)).over(wb))
        .filter(col("base_n") > 1 &&
          col("cents_h") * col("base_n") > lit(2L) * col("base_s1"))
        .select(col("event_type"), col("hour_no").cast("bigint").as("hour_no"),
          col("hour_utc").cast("bigint").as("hour_utc"),
          col("cents_h").cast("bigint").as("cents_h"),
          col("base_n").cast("bigint").as("base_n"),
          col("base_s1").cast("bigint").as("base_s1"),
          (col("cents_h").cast("double") * col("base_n").cast("double") /
            col("base_s1").cast("double")).as("lift"))
        .orderBy("event_type", "hour_no")
    },

    QueryDef("q_ts_cume_users",
      """WITH f AS (
        |  SELECT event_type, user_id,
        |    min(epoch_us(ts) // 86400000000) AS first_day
        |  FROM events GROUP BY event_type, user_id
        |),
        |d AS (SELECT event_type, first_day AS day_no, count(*) AS new_users
        |      FROM f GROUP BY 1, 2)
        |SELECT event_type, CAST(day_no AS BIGINT) AS day_no,
        |  CAST(new_users AS BIGINT) AS new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day_no
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cume_users
        |FROM d ORDER BY event_type, day_no""".stripMargin) { (s, d) =>
      // cumulative distinct users per metric per day — the growth curve
      // every dashboard wants, computed WITHOUT running set-union
      // state: a user contributes to (metric, day D) iff their FIRST
      // event on that metric is <= D, so cumulative-distinct = running
      // sum of first-appearance counts. Two map-side-combined aggs
      // (per-(metric, user) min, per-(metric, day) count) and one
      // running window over <=days rows per metric — the exact-distinct
      // running count at 100 TB with nothing resembling a
      // distinct-state store, and the window partitions by metric so no
      // single task sees more than one metric's <=days-row rollup
      val f = Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(min(expr("unix_micros(ts) div 86400000000")).as("first_day"))
      val wd = Window.partitionBy("event_type").orderBy("day_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      f.groupBy(col("event_type"), col("first_day").as("day_no"))
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cume_users", sum("new_users").over(wd))
        .select(col("event_type"), col("day_no").cast("bigint").as("day_no"),
          col("new_users").cast("bigint").as("new_users"),
          col("cume_users").cast("bigint").as("cume_users"))
        .orderBy("event_type", "day_no")
    },

    QueryDef("q_ts_retention",
      """WITH a AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week_no
        |  FROM events
        |),
        |f AS (SELECT user_id, min(week_no) AS cohort FROM a GROUP BY user_id),
        |cs AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY cohort),
        |m AS (SELECT f.cohort, a.week_no - f.cohort AS offset_w,
        |        count(*) AS n_active
        |      FROM a JOIN f ON a.user_id = f.user_id
        |      GROUP BY 1, 2)
        |SELECT CAST(m.cohort AS BIGINT) AS cohort,
        |  CAST(m.offset_w AS BIGINT) AS offset_w,
        |  CAST(m.n_active AS BIGINT) AS n_active,
        |  CAST(cs.n_cohort AS BIGINT) AS n_cohort,
        |  CAST(m.n_active AS DOUBLE) / CAST(cs.n_cohort AS DOUBLE) AS retention
        |FROM m JOIN cs ON cs.cohort = m.cohort
        |ORDER BY cohort, offset_w""".stripMargin) { (s, d) =>
      // cohort retention matrix — the device-uptime / user-stickiness
      // view: users grouped by first-active week, fraction still active
      // N weeks later. All exact integers until the final ratio; the
      // (user, week) distinct is the only row-scaled shuffle, the
      // cohort map is user-sized, and the matrix itself is
      // weeks x weeks tiny. At 100 TB: one map-side-combined distinct,
      // one user-keyed equi-join, nothing driver-sized
      val a = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("week_no"))
        .distinct()
      val f = a.groupBy("user_id").agg(min("week_no").as("cohort"))
      val cs = f.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
      a.join(f, "user_id")
        .groupBy(col("cohort"), (col("week_no") - col("cohort")).as("offset_w"))
        .agg(count(lit(1)).as("n_active"))
        .join(cs, "cohort")
        .select(col("cohort").cast("bigint").as("cohort"),
          col("offset_w").cast("bigint").as("offset_w"),
          col("n_active").cast("bigint").as("n_active"),
          col("n_cohort").cast("bigint").as("n_cohort"),
          (col("n_active").cast("double") / col("n_cohort").cast("double"))
            .as("retention"))
        .orderBy("cohort", "offset_w")
    },

    QueryDef("q_ts_downsample_m4",
      MeasurementsSql +
      """
        |SELECT user_id, event_type, (ts_us // 21600000000) * 21600 AS slot_ts,
        |  count(*) AS n,
        |  CAST(min(cents) AS DOUBLE) / 100.0 AS min_val,
        |  CAST(max(cents) AS DOUBLE) / 100.0 AS max_val,
        |  CAST(first(cents ORDER BY ts_us, event_id) AS DOUBLE) / 100.0 AS first_val,
        |  CAST(last(cents ORDER BY ts_us, event_id) AS DOUBLE) / 100.0 AS last_val
        |FROM m GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      // M4 visualization downsample (the min/max/first/last-per-pixel
      // aggregation from the M4 paper): the 4 extrema per bucket are
      // exactly what a line chart needs to render error-free, and all
      // four are ONE map-side-combined hash aggregate — no window, no
      // sort, one shuffle on the (series, slot) key. first/last order
      // on the UNIQUE (ts_us, event_id) suffix — the repo-wide series
      // window convention — not bare ts_us: nothing enforces (series,
      // ts) uniqueness on the raw measurements view, and a tied ts
      // would make a bare-ts arg_min engine-nondeterministic
      Tables.measurements(s, d)
        .withColumn("slot_ts", TimeSeriesOps.slotSec(21600L))
        .groupBy("user_id", "event_type", "slot_ts")
        .agg(count(lit(1)).as("n"),
          (min("cents").cast("double") / 100.0).as("min_val"),
          (max("cents").cast("double") / 100.0).as("max_val"),
          (min_by(col("cents"), struct(col("ts_us"), col("event_id")))
            .cast("double") / 100.0).as("first_val"),
          (max_by(col("cents"), struct(col("ts_us"), col("event_id")))
            .cast("double") / 100.0).as("last_val"))
        .select(col("user_id"), col("event_type"), col("slot_ts"), col("n"),
          col("min_val"), col("max_val"), col("first_val"), col("last_val"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_downsample_tri",
      MeasurementsSql.stripSuffix(")") +
      """),
        |p AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents,
        |    lag(ts_us)  OVER w AS pts, lag(cents)  OVER w AS pc,
        |    lead(ts_us) OVER w AS nts, lead(cents) OVER w AS nc
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type
        |                      ORDER BY ts_us, event_id)
        |), a AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents,
        |    (ts_us // 21600000000) * 21600 AS slot_ts,
        |    abs(CAST(pts - nts AS HUGEINT) * (cents - pc)
        |        - CAST(pts - ts_us AS HUGEINT) * (nc - pc)) AS area2
        |  FROM p WHERE pts IS NOT NULL AND nts IS NOT NULL
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, slot_ts
        |                               ORDER BY area2 DESC, ts_us ASC,
        |                                        event_id ASC) AS rn
        |  FROM a
        |)
        |SELECT user_id, event_type, slot_ts, ts_us,
        |  CAST(cents AS DOUBLE) / 100.0 AS value
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type, slot_ts""".stripMargin) { (s, d) =>
      // largest-triangle downsample, one-bucket variant (LTOB): per
      // bucket keep the point forming the largest triangle with its
      // immediate neighbors — the shape-preserving pick a dashboard
      // wants when min/max/avg flatten the signal. Deliberately LTOB
      // for the DEFAULT viz path: LTTB chains each bucket's pick into
      // the next bucket's triangle, a per-series sequential dependency
      // (exact LTTB exists as q_ts_downsample_lttb — parallel across
      // series via a streaming two-bucket fold, but never within one);
      // LTOB is embarrassingly parallel even within a series and its
      // plan is two window passes over ONE series exchange (the
      // (series, slot) window reuses the (series) hash partitioning —
      // sub-partition clustering is satisfied).
      // Twice the triangle area in exact int64 µs·cents (|Δx| ≤ series
      // span 2.6e12 µs × |Δy| ≤ 5.7e4 cents ≈ 1.5e17 < 2^63), so the
      // argmax is engine-invariant. Both windows order on the UNIQUE
      // (…, event_id) suffix — the repo-wide series-window convention:
      // a tied (series, ts) pair would otherwise make the lag/lead
      // neighbor assignment (and so area2 itself) nondeterministic
      Util.requireLoudOverflow(s)
      val m = Tables.measurements(s, d)
        .withColumn("slot_ts", TimeSeriesOps.slotSec(21600L))
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
      // area2's µs·cents cross products: int64 by default (bound
      // |Δts_us·Δcents| < 2^63, ANSI-loud past it), decimal-first
      // under spark.graft.wideMoments (round 13) — the argmax then
      // orders on exact decimals; the oracle is HUGEINT-first
      // unconditionally. Only the ORDERING uses area2, so the output
      // column types are identical either way.
      def dx(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (Util.wideMoments(s)) (a - b).cast("decimal(20,0)") else a - b
      val p = m.select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("cents"), col("slot_ts"),
          lag("ts_us", 1).over(w).as("pts"), lag("cents", 1).over(w).as("pc"),
          lead("ts_us", 1).over(w).as("nts"), lead("cents", 1).over(w).as("nc"))
        .filter(col("pts").isNotNull && col("nts").isNotNull)
        .withColumn("area2", abs(dx(col("pts"), col("nts")) * (col("cents") - col("pc"))
          - dx(col("pts"), col("ts_us")) * (col("nc") - col("pc"))))
      val wr = Window.partitionBy("user_id", "event_type", "slot_ts")
        .orderBy(col("area2").desc, col("ts_us").asc, col("event_id").asc)
      p.withColumn("rn", row_number().over(wr))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("slot_ts"), col("ts_us"),
          (col("cents").cast("double") / 100.0).as("value"))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef.noOracle("q_ts_downsample_lttb") { (s, d) =>
      // the TRUE sequential LTTB chain (round 10 — each bucket's pick
      // feeds the next bucket's triangle, the property LTOB trades away
      // for parallelism): one hash exchange on the series key, an
      // in-partition sort, and a streaming two-bucket fold per series
      // (TimeSeriesOps.lttb) — parallel ACROSS series, task memory
      // bounded by poll density × step, never series length. No DuckDB
      // oracle (the chain has no SQL form short of a recursive CTE);
      // LttbSpec pins the fold against a naive whole-series reference
      Tables.measurements(s, d)
        .transform(TimeSeriesOps.lttb(_, 21600L))
        .orderBy("user_id", "event_type", "slot_ts")
    },

    QueryDef("q_ts_irate",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, ts_us, wrapped,
        |         lag(wrapped) OVER w AS prev_wrapped,
        |         lag(ts_us) OVER w AS prev_ts_us,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM m WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
        |)
        |SELECT user_id, event_type, ts_us AS last_ts_us,
        |  ((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS delta_cents,
        |  ts_us - prev_ts_us AS dt_us,
        |  CASE WHEN ts_us - prev_ts_us > 0 THEN
        |    (CAST(((wrapped - prev_wrapped) % 1000000 + 1000000) % 1000000 AS DOUBLE) / 100.0)
        |    / (CAST(ts_us - prev_ts_us AS DOUBLE) / 1000000.0) END AS irate
        |FROM r WHERE rn = 1 AND prev_ts_us IS NOT NULL
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // instantaneous rate (PromQL `irate`): the wrap-corrected rate
      // from only the LAST two samples of each series — the "what is
      // this counter doing RIGHT NOW" read, vs q_ts_rate_counter's
      // every-adjacent-pair derivation. Both window passes (asc lag,
      // desc row_number) share the ONE series hash exchange — Spark
      // plans a second in-partition sort, never a second shuffle, so
      // at 100 TB the cost is one shuffle of the scanned range (and
      // with the dt-partitioned production layout the range scan is
      // the trailing chunk, not the full series). The rate division
      // reuses q_ts_rate_counter's textually-identical IEEE form on
      // exact integer inputs — bit-equal across engines.
      val wDesc = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      TimeSeriesOps.withRate(s, Tables.measurements(s, d))
        .withColumn("rn", row_number().over(wDesc))
        .filter(col("rn") === 1 && col("prev_ts_us").isNotNull)
        .select(col("user_id"), col("event_type"), col("ts_us").as("last_ts_us"),
          col("delta_cents"), col("dt_us"), col("rate").as("irate"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_histogram_quantile",
      MeasurementsSql +
      s""",
        |h AS (
        |  SELECT event_type, (ts_us // 86400000000) * 86400 AS day_ts,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    ${TsQueries.hqCumSql}
        |  FROM m GROUP BY 1, 2
        |),
        |k AS (SELECT *, 0.75 * CAST(n_total AS DOUBLE) AS rnk FROM h)
        |SELECT event_type, day_ts, n_total,
        |  ${TsQueries.hqLadderSql} AS p75_est
        |FROM k ORDER BY event_type, day_ts""".stripMargin) { (s, d) =>
      // PromQL-style histogram_quantile: serve a quantile ESTIMATE from
      // cumulative le-bucket counters — the shape a fleet of pollers
      // actually ships (fixed boundaries, mergeable integer counts; the
      // exact-sample machinery of quant_<step> is the other end of the
      // accuracy/size trade). The whole query is ONE map-side-combined
      // hash aggregate (8 filtered counts per group — no window, no
      // sort, one shuffle on (event_type, day)); the bucket walk +
      // within-bucket linear interpolation is a pure projection. The
      // CASE ladder text is GENERATED ONCE (hqLadderSql) and evaluated
      // verbatim by both engines: integer cumulative counts are exact,
      // rank 0.75·n is dyadic-exact, and the single interpolation
      // division is the same IEEE op on both sides — bit-equal. Rank
      // beyond the last finite bucket clamps to that boundary (the
      // PromQL convention for +Inf hits).
      // round 18: the CASE-ladder projection moved ABOVE the final sort
      // (the Exchange rangepartitioning samples its child, so the ladder
      // used to evaluate an extra time per run — guide §1/§2.4); the
      // cumulative le_* counts it reads are the agg's own output columns
      // and flow through the sort unchanged
      Tables.measurements(s, d)
        .groupBy(col("event_type"),
          (expr("ts_us div 86400000000") * 86400).as("day_ts"))
        .agg(count(lit(1)).as("n_total"),
          TsQueries.hqBounds.zipWithIndex.map { case (b, i) =>
            count(when(col("cents") <= b, 1)).as(s"le_${i + 1}")
          }: _*)
        .orderBy("event_type", "day_ts")
        .withColumn("rnk", expr("0.75 * CAST(n_total AS DOUBLE)"))
        .select(col("event_type"), col("day_ts"), col("n_total"),
          expr(TsQueries.hqLadderSql).as("p75_est"))
    },

    QueryDef("q_ts_holt",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |             CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT user_id, event_type,
        |        list(CAST(cents AS DOUBLE) ORDER BY ts_us, event_id) AS vs
        |      FROM s GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, CAST(len(vs) AS BIGINT) AS n,
        |        list_reduce(
        |          list_transform(vs, v -> [CAST(v AS DOUBLE), CAST(0.0 AS DOUBLE)]),
        |          (acc, e) -> [0.2 * e[1] + 0.8 * (acc[1] + acc[2]),
        |                       0.1 * ((0.2 * e[1] + 0.8 * (acc[1] + acc[2])) - acc[1]) + 0.9 * acc[2]]) AS st
        |      FROM l)
        |SELECT user_id, event_type, n,
        |  round(st[1] / 100.0, 4) + 0 AS level,
        |  round(st[2] / 100.0, 4) + 0 AS trend
        |FROM r ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // Holt double-exponential smoothing (level + linear trend, the
      // forecasting read one step up from q_ts_ema's plain EMA): the
      // coupled two-term recurrence LOOKS doubly sequential, but each
      // step is an affine map on the (level, trend) 2-vector and affine
      // maps compose associatively — TimeSeriesOps.holtChunked runs it
      // as the same chunked two-level scan as the EMA, with 2×2-matrix
      // coefficient pairs instead of scalars (task memory bounded by
      // chunkSize, never series length; partitioning-invariant by
      // construction). The oracle folds sequentially with a 2-element
      // LIST accumulator — deliberately NOT a struct: DuckDB 1.0.0's
      // list_reduce evaluates a struct-literal lambda field by field
      // with `acc` ALIASED to the partial result, so a later field
      // reading acc.l sees the new level (observed live: trend drifts
      // by exactly the aliased recurrence); list literals evaluate all
      // elements against the old accumulator. Both sides hash behind
      // round(…,4) (regrouped double arithmetic — HoltSpec pins the
      // ~1e-12 agreement), and `+ 0` normalizes the −0.0 a rounded
      // negative trend can produce in DuckDB but not in Spark's
      // decimal HALF_UP (§7.4).
      // MAGNITUDE BOUND (round-12 ScaleVerify find): the 4-dp round
      // only absorbs the chunked refactor's ~1e-12 RELATIVE slack
      // while |level|·1e-12 ≪ 0.5e-4, i.e. |level| ≲ 10^7 value
      // units. The mag-sum replica (level ≈ 3.7e7) crossed it —
      // oracle …347.49 vs spark …347.4901 — so the declared equality
      // holds below ~10^7 and the at-scale gate verifies this family
      // in the mag-moment arm (×100, well inside the bound) instead.
      // spark.graft.wideMoments (round 13) lifts the |level| ≲ 10⁷
      // bound by swapping the chunked scan for holtSequential — the
      // IDENTICAL scalar step tree as the oracle fold (1−α and 1−β
      // for α=0.2, β=0.1 round to the very doubles the oracle's
      // 0.8/0.9 literals denote — verified bit-exact), so level and
      // trend agree BIT-FOR-BIT pre-round at any magnitude, at the
      // cost of the sequential per-series pass q_stream_holt declares.
      val core =
        if (Util.wideMoments(s)) {
          import s.implicits._
          graft.streaming.StreamingOps.holtSequential(
              Tables.events(s, d)
                .select(col("user_id"), col("event_type"),
                  unix_micros(col("ts")).as("ts_us"), col("event_id"),
                  expr("CAST(round(value*100) AS BIGINT)").as("cents"))
                .as[graft.streaming.StreamingOps.MeasK],
              alpha = 0.2, beta = 0.1).toDF()
        } else TimeSeriesOps.holtChunked(
          Tables.events(s, d)
            .select(col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("ts_us"), col("event_id"),
              expr("CAST(round(value*100) AS BIGINT)").cast("double").as("v")),
          alpha = 0.2, beta = 0.1)
      core
        .select(col("user_id"), col("event_type"), col("n"),
          (round(col("level") / 100.0, 4) + lit(0)).as("level"),
          (round(col("trend") / 100.0, 4) + lit(0)).as("trend"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_weighted_median",
      MeasurementsSql +
      """,
        |w AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents,
        |         lead(ts_us) OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts_us, event_id) - ts_us AS w_us
        |  FROM m
        |),
        |c AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents, w_us,
        |         sum(w_us) OVER (PARTITION BY user_id, event_type
        |                         ORDER BY cents, ts_us, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
        |         sum(w_us) OVER (PARTITION BY user_id, event_type) AS tot_w
        |  FROM w WHERE w_us IS NOT NULL
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY cents, ts_us, event_id) AS rn
        |  FROM c WHERE 2 * cum_w >= tot_w
        |)
        |SELECT user_id, event_type, CAST(tot_w AS BIGINT) AS tot_w_us,
        |  CAST(cents AS DOUBLE) / 100.0 AS wmedian
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // duration-weighted median: the value the series spent half its
      // observed time at or below — the availability/SLO read that
      // sample-count quantiles get WRONG on irregular polls (a flapping
      // burst of 100 quick samples should not outvote an hour sat at
      // one level). Each sample weighs its hold time (dt to the next
      // sample; the last sample holds nothing observed and drops —
      // half-open range semantics). Everything before the final /100
      // projection is exact BIGINT: hold times, cumulative weights in
      // VALUE order, and the dyadic q=1/2 test written as the integer
      // cross-multiplication 2·cum ≥ tot — no float can flip a
      // boundary in either engine. All three window passes (lead in
      // time order, cumsum + total in value order, rank) partition on
      // the SAME series key — ONE hash exchange, re-sorts in place
      // (the q_ts_irate/LTOB sub-clustering argument; PlanAuditSpec
      // counts it).
      val wSeries = Window.partitionBy("user_id", "event_type")
      val wTime = wSeries.orderBy("ts_us", "event_id")
      val wVal = wSeries.orderBy("cents", "ts_us", "event_id")
      Tables.measurements(s, d)
        .withColumn("w_us", lead("ts_us", 1).over(wTime) - col("ts_us"))
        .filter(col("w_us").isNotNull)
        .withColumn("cum_w", sum("w_us").over(wVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot_w", sum("w_us").over(wSeries))
        .filter(lit(2) * col("cum_w") >= col("tot_w"))
        .withColumn("rn", row_number().over(wVal))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("tot_w").cast("bigint").as("tot_w_us"),
          (col("cents").cast("double") / 100.0).as("wmedian"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_autocorr",
      MeasurementsSql +
      s""",
        |p AS (
        |  SELECT user_id, event_type, cents AS x,
        |         lead(cents) OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts_us, event_id) AS y
        |  FROM m
        |),
        |a AS (
        |  SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT)*x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT)*y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT)*y) AS HUGEINT) AS sxy,
        |    CAST(min(x) AS BIGINT) AS mn_x, CAST(max(x) AS BIGINT) AS mx_x,
        |    CAST(min(y) AS BIGINT) AS mn_y, CAST(max(y) AS BIGINT) AS mx_y
        |  FROM p WHERE y IS NOT NULL
        |  GROUP BY user_id, event_type
        |)
        |SELECT user_id, event_type, n,
        |  ${TsQueries.acfCaseSql(forOracle = true)} AS acf1
        |FROM a ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // lag-1 autocorrelation per series — the self-similarity /
      // seasonality detector (a counter ramping smoothly → acf1 ≈ 1, a
      // white gauge → ≈ 0): Pearson r over the (xₜ, xₜ₊₁) pair stream.
      // The §7.4 moment pattern: ALL six sufficient statistics
      // aggregate as exact integers (per-term products in int64 while
      // |cents| < 3e9 — ANSI-loud past it, or exact decimal-first
      // under spark.graft.wideMoments (round 13); sums in
      // DECIMAL(38,0)/HUGEINT so series LENGTH
      // can never overflow them — order-independent,
      // partial-agg-proof), and the
      // single projection evaluates a TEXTUALLY IDENTICAL IEEE tree in
      // both engines (products of exact integers in double round
      // identically; sqrt and / are correctly-rounded IEEE ops), so
      // acf1 is emitted UNROUNDED — strictly more deterministic than a
      // re-round. Constant series (zero variance) yield NULL via the
      // guard, identically in both engines. Plan: the lead window
      // shares the series exchange convention; the moment agg is ONE
      // map-side-combined hash aggregate over 6 integer sums.
      Util.requireLoudOverflow(s)
      val wTime = Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
      Tables.measurements(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
          col("cents").as("x"))
        .withColumn("y", lead("x", 1).over(wTime))
        .filter(col("y").isNotNull)
        .groupBy("user_id", "event_type")
        // sums accumulate in DECIMAL(38,0) / HUGEINT (the §7.4
        // group-size rule, round 12): per-term products stay
        // int64-bounded by |cents| < 3e9, the sums grow with series
        // LENGTH — both widenings are exact and acfCaseSql's
        // per-operand CAST(... AS DOUBLE) is unchanged
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(Util.momentProd(s)(col("x"), col("x"))).as("sxx"),
          sum(Util.momentProd(s)(col("y"), col("y"))).as("syy"),
          sum(Util.momentProd(s)(col("x"), col("y"))).as("sxy"),
          min("x").as("mn_x"), max("x").as("mx_x"),
          min("y").as("mn_y"), max("y").as("mx_y"))
        .select(col("user_id"), col("event_type"), col("n"),
          expr(TsQueries.acfCaseSql(forOracle = false)).as("acf1"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_mad",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY cents, ts_us, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type) AS n
        |  FROM m
        |),
        |md AS (
        |  SELECT *,
        |    max(CASE WHEN rn = (n+1)//2 THEN cents END)
        |      OVER (PARTITION BY user_id, event_type) AS mid1,
        |    max(CASE WHEN rn = (n+2)//2 THEN cents END)
        |      OVER (PARTITION BY user_id, event_type) AS mid2
        |  FROM r
        |),
        |d AS (
        |  SELECT user_id, event_type, ts_us, event_id, n,
        |    2 * (mid1 + mid2) AS med4,
        |    abs(4 * cents - 2 * (mid1 + mid2)) AS dev4
        |  FROM md
        |),
        |rd AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY dev4, ts_us, event_id) AS rnd
        |  FROM d
        |),
        |f AS (
        |  SELECT *,
        |    max(CASE WHEN rnd = (n+1)//2 THEN dev4 END)
        |      OVER (PARTITION BY user_id, event_type) AS dmid1,
        |    max(CASE WHEN rnd = (n+2)//2 THEN dev4 END)
        |      OVER (PARTITION BY user_id, event_type) AS dmid2
        |  FROM rd
        |)
        |SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
        |  CAST(med4 AS DOUBLE) / 400.0 AS median,
        |  CAST(dmid1 + dmid2 AS DOUBLE) / 800.0 AS mad
        |FROM f WHERE rnd = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // per-series MAD (median absolute deviation) — the robust outlier
      // scale the z-score anomaly family breaks on (one spike inflates
      // a stddev; it cannot move the MAD): flag |x − med| > k·MAD. Both
      // medians use the exact middle-rank selection of
      // q_agg_median_exact, lifted to scaled-INTEGER units so even-n
      // midpoints stay exact — med4 = 2·(mid1+mid2) is 4× the median,
      // dev4 = |4·cents − med4| is 4× each deviation, dmid1+dmid2 is 8×
      // the MAD; the only doubles are the final /400, /800 projections
      // of exact integers (identical text both engines). Every window
      // (two rank passes, four middle-pick maxes, the count) partitions
      // on the series key — ONE hash exchange, re-sorted in place
      // (PlanAuditSpec counts it); no join, no second shuffle.
      val wSeries = Window.partitionBy("user_id", "event_type")
      val wVal = wSeries.orderBy("cents", "ts_us", "event_id")
      val r = Tables.measurements(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("cents"))
        .withColumn("rn", row_number().over(wVal))
        .withColumn("n", count(lit(1)).over(wSeries))
        .withColumn("mid1",
          max(when(col("rn") === expr("(n+1) div 2"), col("cents"))).over(wSeries))
        .withColumn("mid2",
          max(when(col("rn") === expr("(n+2) div 2"), col("cents"))).over(wSeries))
        .withColumn("med4", lit(2) * (col("mid1") + col("mid2")))
        .withColumn("dev4", abs(lit(4) * col("cents") - col("med4")))
      val wDev = wSeries.orderBy("dev4", "ts_us", "event_id")
      r.withColumn("rnd", row_number().over(wDev))
        .withColumn("dmid1",
          max(when(col("rnd") === expr("(n+1) div 2"), col("dev4"))).over(wSeries))
        .withColumn("dmid2",
          max(when(col("rnd") === expr("(n+2) div 2"), col("dev4"))).over(wSeries))
        .filter(col("rnd") === 1) // one row per series, inside the clustering
        .select(col("user_id"), col("event_type"), col("n").cast("bigint").as("n"),
          (col("med4").cast("double") / 400.0).as("median"),
          ((col("dmid1") + col("dmid2")).cast("double") / 800.0).as("mad"))
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_xcorr",
      MeasurementsSql +
      s""",
        |sl AS (
        |  SELECT user_id, (ts_us // 21600000000) * 21600 AS slot_ts,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN cents END), 0) AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN cents END), 0) AS BIGINT) AS y
        |  FROM m WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2
        |),
        |a AS (
        |  SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT)*x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT)*y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT)*y) AS HUGEINT) AS sxy,
        |    CAST(min(x) AS BIGINT) AS mn_x, CAST(max(x) AS BIGINT) AS mx_x,
        |    CAST(min(y) AS BIGINT) AS mn_y, CAST(max(y) AS BIGINT) AS mx_y
        |  FROM sl GROUP BY user_id
        |)
        |SELECT user_id, n,
        |  ${TsQueries.acfCaseSql(forOracle = true)} AS xcorr
        |FROM a ORDER BY user_id""".stripMargin) { (s, d) =>
      // cross-correlation between two metrics per entity — "do this
      // user's clicks and views co-move?": align both series on the 6h
      // slot grid (filtered sums in ONE pass — no self-join; a slot
      // either metric touched contributes, the absent one as 0), then
      // Pearson r over the aligned (x, y) slot pairs. Reuses the SAME
      // generated projection as q_ts_autocorr (acfCaseSql) over the
      // same six exact-BIGINT sufficient statistics — the align step
      // is the only new machinery. Two hash aggregates: the (user,
      // slot) alignment grain, then the per-user moments; the second
      // grouping is not a sub-clustering of the first's hash
      // partitioning, so this costs two exchanges by design — at 100 TB
      // both are map-side-combined and the second input is |users|·
      // slots, already tiny.
      Util.requireLoudOverflow(s)
      Tables.measurements(s, d)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"),
          (expr("ts_us div 21600000000") * 21600).as("slot_ts"))
        .agg(
          coalesce(sum(when(col("event_type") === "click", col("cents"))), lit(0L))
            .cast("bigint").as("x"),
          coalesce(sum(when(col("event_type") === "view", col("cents"))), lit(0L))
            .cast("bigint").as("y"))
        .groupBy("user_id")
        // DECIMAL(38,0)/HUGEINT sums per the §7.4 group-size rule
        // (round 12) — see q_ts_autocorr
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(Util.momentProd(s)(col("x"), col("x"))).as("sxx"),
          sum(Util.momentProd(s)(col("y"), col("y"))).as("syy"),
          sum(Util.momentProd(s)(col("x"), col("y"))).as("sxy"),
          min("x").as("mn_x"), max("x").as("mx_x"),
          min("y").as("mn_y"), max("y").as("mx_y"))
        .select(col("user_id"), col("n"), expr(TsQueries.acfCaseSql(forOracle = false)).as("xcorr"))
        .orderBy("user_id")
    },

    QueryDef("q_ts_outliers_mad",
      MeasurementsSql +
      """,
        |r AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY cents, ts_us, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type) AS n
        |  FROM m
        |),
        |md AS (
        |  SELECT *,
        |    max(CASE WHEN rn = (n+1)//2 THEN cents END)
        |      OVER (PARTITION BY user_id, event_type) AS mid1,
        |    max(CASE WHEN rn = (n+2)//2 THEN cents END)
        |      OVER (PARTITION BY user_id, event_type) AS mid2
        |  FROM r
        |),
        |d AS (
        |  SELECT user_id, event_type, ts_us, event_id, cents, n,
        |    abs(4 * cents - 2 * (mid1 + mid2)) AS dev4
        |  FROM md
        |),
        |rd AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY dev4, ts_us, event_id) AS rnd
        |  FROM d
        |),
        |f AS (
        |  SELECT *,
        |    max(CASE WHEN rnd = (n+1)//2 THEN dev4 END)
        |      OVER (PARTITION BY user_id, event_type) AS dmid1,
        |    max(CASE WHEN rnd = (n+2)//2 THEN dev4 END)
        |      OVER (PARTITION BY user_id, event_type) AS dmid2
        |  FROM rd
        |)
        |SELECT user_id, event_type, ts_us, event_id,
        |  CAST(cents AS DOUBLE) / 100.0 AS value,
        |  CASE WHEN dmid1 + dmid2 > 0 THEN
        |    0.6745 * (2.0 * CAST(dev4 AS DOUBLE)) / CAST(dmid1 + dmid2 AS DOUBLE)
        |  END AS mz_score
        |FROM f
        |WHERE (dmid1 + dmid2 > 0 AND 4 * dev4 > 7 * (dmid1 + dmid2))
        |   OR (dmid1 + dmid2 = 0 AND dev4 > 0)
        |ORDER BY user_id, event_type, ts_us, event_id""".stripMargin) { (s, d) =>
      // robust outlier DETECTION — the actionable end of q_ts_mad:
      // flag samples whose deviation from the series median exceeds
      // 3.5× the MAD (the classic modified-z rule; one spike cannot
      // widen the gate the way it widens a stddev). The decision
      // predicate is PURE INTEGER — dev > 3.5·MAD written as the
      // cross-multiplication 4·dev4 > 7·mad8 in scaled units — so no
      // float boundary can flip membership in either engine; the
      // modified z-score 0.6745·dev/MAD is emitted through the shared
      // IEEE text (exact-integer operands, identical ops). Zero-MAD
      // series (≥ half the samples AT the median) are the detector's
      // WORST-case input, not an exclusion: any nonzero deviation
      // there is infinitely many MADs out, so the mad8 = 0 ∧ dev4 > 0
      // arm flags those rows too (score NULL — the quotient is
      // undefined), still through exact integer tests. Same
      // one-exchange window stack as q_ts_mad, emitting flagged ROWS.
      val wSeries = Window.partitionBy("user_id", "event_type")
      val wVal = wSeries.orderBy("cents", "ts_us", "event_id")
      val r = Tables.measurements(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("cents"))
        .withColumn("rn", row_number().over(wVal))
        .withColumn("n", count(lit(1)).over(wSeries))
        .withColumn("mid1",
          max(when(col("rn") === expr("(n+1) div 2"), col("cents"))).over(wSeries))
        .withColumn("mid2",
          max(when(col("rn") === expr("(n+2) div 2"), col("cents"))).over(wSeries))
        .withColumn("dev4", abs(lit(4) * col("cents") - lit(2) * (col("mid1") + col("mid2"))))
      val wDev = wSeries.orderBy("dev4", "ts_us", "event_id")
      r.withColumn("rnd", row_number().over(wDev))
        .withColumn("dmid1",
          max(when(col("rnd") === expr("(n+1) div 2"), col("dev4"))).over(wSeries))
        .withColumn("dmid2",
          max(when(col("rnd") === expr("(n+2) div 2"), col("dev4"))).over(wSeries))
        .withColumn("mad8", col("dmid1") + col("dmid2"))
        .filter((col("mad8") > 0 && lit(4) * col("dev4") > lit(7) * col("mad8"))
          || (col("mad8") === 0 && col("dev4") > 0))
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
          (col("cents").cast("double") / 100.0).as("value"),
          when(col("mad8") > 0,
            lit(0.6745) * (lit(2.0) * col("dev4").cast("double"))
              / col("mad8").cast("double")).as("mz_score"))
        .orderBy("user_id", "event_type", "ts_us", "event_id")
    },

    QueryDef("q_ts_changes",
      MeasurementsSql +
      """,
        |p AS (
        |  SELECT user_id, event_type, cents,
        |         lag(cents) OVER (PARTITION BY user_id, event_type
        |                          ORDER BY ts_us, event_id) AS prev
        |  FROM m
        |)
        |SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN prev IS NOT NULL AND cents <> prev THEN 1 END) AS BIGINT) AS n_changes,
        |  CAST(count(CASE WHEN prev IS NOT NULL AND cents = prev THEN 1 END) AS BIGINT) AS n_flat
        |FROM p GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // PromQL `changes()`: how many times each series' value actually
      // CHANGED across adjacent samples — the flapping/staleness
      // detector that closes the counter-health family (resets live in
      // q_ts_counter_stats, irate/rate in their rows). n_flat counts
      // the repeated-value polls (a stuck gauge shows n_flat ≈ n−1).
      // One lag window on the series exchange, then a map-side-combined
      // integer agg — nothing but BIGINTs end to end.
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts_us", "event_id")
      Tables.measurements(s, d)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"), col("cents"))
        .withColumn("prev", lag("cents", 1).over(w))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          count(when(col("prev").isNotNull && col("cents") =!= col("prev"), 1))
            .as("n_changes"),
          count(when(col("prev").isNotNull && col("cents") === col("prev"), 1))
            .as("n_flat"))
        .orderBy("user_id", "event_type")
    }
  )

  /** Cumulative le-bucket boundaries (cents) for q_ts_histogram_quantile —
    * chosen to straddle the fixture's value distribution (p10≈519,
    * p99≈22755 cents at sf0.01). */
  lazy val hqBounds: Seq[Long] = Seq(500L, 1000L, 2500L, 5000L, 10000L, 20000L, 50000L)

  /** The oracle-side cumulative-count aggregate list — same filtered
    * counts the Spark agg computes. */
  def hqCumSql: String =
    hqBounds.zipWithIndex.map { case (b, i) =>
      s"CAST(count(CASE WHEN cents <= $b THEN 1 END) AS BIGINT) AS le_${i + 1}"
    }.mkString(",\n    ")

  /** q_ts_autocorr's Pearson projection over the six exact-integer
    * sufficient statistics — GENERATED ONCE and evaluated verbatim by
    * both engines (the hqLadderSql pattern: the unrounded cross-engine
    * bit-equality contract depends on the expression text never
    * drifting between the two copies). Zero-variance (constant) series
    * fall to NULL through the EXACT integer gate mn_x < mx_x AND
    * mn_y < mx_y (the skewSql pattern — the double product varX·varY
    * stops being an exact zero detector once n·sxx or sx² exceeds
    * 2^53, where a constant series could emit garbage through a
    * rounding-created tiny nonzero variance), with the float
    * varX·varY > 0 test kept ONLY as the sqrt-domain guard so a
    * pathological rounded-nonpositive product can never reach sqrt.
    * Callers must carry min/max of x and y through the aggregate as
    * mn_x/mx_x/mn_y/mx_y. */
  def acfCaseSql(forOracle: Boolean): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    // §7.4 int128→double rule, engine-split form (round 14): DuckDB's
    // HUGEINT→DOUBLE double-rounds past ~2^64 (and for NEGATIVES past
    // 2^53), so the ORACLE variant routes every 128-bit-capable sum —
    // the second moments AND the sign-indefinite first moments sx/sy
    // (ADVICE r13 #2: |Σcents| past 2^53 negative is reachable within
    // the documented per-term bounds) — through VARCHAR (strtod,
    // correctly rounded). Spark's long/decimal→double are already
    // correctly rounded, so the Spark variant casts directly and the
    // hot path skips the per-row VARCHAR round-trip. One exact value,
    // one rounding each side → bit-identical doubles (hash-gated).
    def dv(c: String) = if (forOracle) s"CAST(CAST($c AS STRING) AS DOUBLE)" else d(c)
    val varX = s"(${d("n")} * ${dv("sxx")} - ${dv("sx")} * ${dv("sx")})"
    val varY = s"(${d("n")} * ${dv("syy")} - ${dv("sy")} * ${dv("sy")})"
    val cov = s"(${d("n")} * ${dv("sxy")} - ${dv("sx")} * ${dv("sy")})"
    s"CASE WHEN mn_x < mx_x AND mn_y < mx_y AND $varX * $varY > 0 " +
      s"THEN $cov / sqrt($varX * $varY) END"
  }

  /** The bucket-walk + interpolation ladder, evaluated VERBATIM by both
    * engines (Spark `expr`, DuckDB text) so every IEEE operation matches:
    * first bucket whose cumulative count reaches the rank interpolates
    * linearly inside [lo, hi]; a rank past the last finite boundary
    * clamps to it (PromQL's +Inf convention). In-branch the divisor
    * le_k − cum_{k−1} ≥ 1 because the previous branch did not fire. */
  def hqLadderSql: String = {
    val n = hqBounds.size
    val whens = (1 to n).map { k =>
      val lo = if (k == 1) 0L else hqBounds(k - 2)
      val hi = hqBounds(k - 1)
      val cumBelow = if (k == 1) "0" else s"le_${k - 1}"
      s"WHEN CAST(le_$k AS DOUBLE) >= rnk THEN " +
        s"$lo.0 + ${hi - lo}.0 * (rnk - CAST($cumBelow AS DOUBLE)) / CAST(le_$k - $cumBelow AS DOUBLE)"
    }.mkString(" ")
    s"CASE WHEN CAST(le_$n AS DOUBLE) < rnk THEN ${hqBounds.last}.0 $whens ELSE NULL END"
  }
}
