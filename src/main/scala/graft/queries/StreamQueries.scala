package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.Tables.MeasurementsSql

/** SURVEY.md §2 K: batch-equivalents of the streaming windows. The
  * Spark side uses the REAL streaming window operators — `window()`
  * tumbling/sliding and `session_window()` — evaluated in batch mode
  * (identical semantics, Structured Streaming runs the same exprs per
  * microbatch); the oracle states the same windows as slot arithmetic.
  * Stateful streaming proper (watermarks, dedup, custom state) has no
  * SQL oracle and lives in streaming/StreamingOps + ScalaTest. */
object StreamQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_stream_tumbling",
      MeasurementsSql +
      """
        |SELECT event_type, (ts_us // 3600000000) * 3600 AS w_start,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM m GROUP BY event_type, w_start
        |ORDER BY event_type, w_start""".stripMargin) { (s, d) =>
      Tables.measurements(s, d)
        .groupBy(col("event_type"), window(timestamp_micros(col("ts_us")), "1 hour"))
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
        .select(col("event_type"), unix_timestamp(col("window.start")).as("w_start"),
          col("n"), col("sum_cents"))
        .orderBy("event_type", "w_start")
    },

    QueryDef("q_stream_sliding",
      MeasurementsSql +
      """
        |SELECT event_type, ((ts_us // 900000000) - k.k) * 900 AS w_start,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM m CROSS JOIN range(0, 4) k(k)
        |GROUP BY event_type, w_start
        |ORDER BY event_type, w_start""".stripMargin) { (s, d) =>
      // 1 h windows sliding by 15 min: every event lands in exactly 4
      Tables.measurements(s, d)
        .groupBy(col("event_type"),
          window(timestamp_micros(col("ts_us")), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), unix_timestamp(col("window.start")).as("w_start"), col("n"))
        .orderBy("event_type", "w_start")
    },

    QueryDef("q_stream_session",
      MeasurementsSql +
      """,
        |s AS (
        |  SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |),
        |g AS (
        |  SELECT user_id, ts_us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s
        |)
        |SELECT user_id, min(ts_us) AS s_begin_us, max(ts_us) AS s_end_us,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, s_begin_us""".stripMargin) { (s, d) =>
      // session_window merges events with gap < 30 min (an event at
      // exactly start+30min opens a NEW session — mirrored by the
      // oracle's `>= 1800000000` new-session test)
      Tables.measurements(s, d)
        .groupBy(session_window(timestamp_micros(col("ts_us")), "30 minutes"), col("user_id"))
        .agg(min("ts_us").as("s_begin_us"), max("ts_us").as("s_end_us"),
          count(lit(1)).as("n"))
        .select("user_id", "s_begin_us", "s_end_us", "n")
        .orderBy("user_id", "s_begin_us")
    },

    QueryDef("q_stream_dau",
      MeasurementsSql +
      """
        |SELECT (ts_us // 86400000000) * 86400 AS w_start, event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |FROM m GROUP BY 1, 2
        |ORDER BY w_start, event_type""".stripMargin) { (s, d) =>
      // streaming daily-active-users, batch-evaluated: count(DISTINCT)
      // is unsupported in a streaming aggregation, so the online form
      // is dedup-then-count — dropDuplicates(user, type, day window)
      // holds ONE state row per active (user, day), the watermark ages
      // it out, a windowed count aggregates survivors. The SAME
      // pipeline runs here in batch (watermark a no-op) against the
      // oracle's count(DISTINCT); StreamingSpec drives it through
      // MemoryStream microbatches with late-data closure
      graft.streaming.StreamingOps.dauCounts(
          Tables.measurements(s, d)
            .select(col("user_id"), col("event_type"),
              timestamp_micros(col("ts_us")).as("ts")))
        .select(unix_timestamp(col("w_start")).as("w_start"),
          col("event_type"), col("dau"))
        .orderBy("w_start", "event_type")
    },

    QueryDef("q_stream_dedup",
      MeasurementsSql +
      """,
        |dup AS (
        |  SELECT user_id, event_type, event_id, ts_us, cents FROM m
        |  UNION ALL
        |  SELECT user_id, event_type, event_id, ts_us, cents FROM m
        |  WHERE event_id % 10 = 0
        |),
        |ded AS (SELECT DISTINCT user_id, event_type, event_id, ts_us, cents FROM dup)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
        |FROM ded GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // streaming idempotent ingest, batch-evaluated: an at-least-once
      // feed redelivers ~10% of events; dropDuplicatesWithinWatermark
      // on the delivery key keeps ONE state row per event_id inside the
      // watermark horizon and ages it out after — the online twin of
      // the store's slot-upsert idempotence (q_ts_insert_idempotent).
      // Spark rejects within-watermark dedup on bounded input, so
      // dedupEvents dispatches to its batch twin (exact key dedup —
      // the same fixpoint) here, while StreamingSpec drives the
      // streaming form through MemoryStream with a redelivered batch.
      val base = Tables.measurements(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts_us"), col("cents"))
      val redelivered = base.unionAll(base.filter(col("event_id") % 10 === 0))
        .withColumn("ts", timestamp_micros(col("ts_us")))
      graft.streaming.StreamingOps.dedupEvents(redelivered)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          countDistinct("event_id").as("n_ids"))
        .orderBy("event_type")
    },

    QueryDef("q_stream_holt",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |             CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT user_id, event_type,
        |        list(CAST(cents AS DOUBLE) ORDER BY ts_us, event_id) AS vs
        |      FROM s GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, CAST(len(vs) AS BIGINT) AS n,
        |        list_reduce(
        |          list_transform(vs, v -> [CAST(v AS DOUBLE), CAST(0.0 AS DOUBLE)]),
        |          (acc, e) -> [0.25 * e[1] + 0.75 * (acc[1] + acc[2]),
        |                       0.125 * ((0.25 * e[1] + 0.75 * (acc[1] + acc[2])) - acc[1]) + 0.875 * acc[2]]) AS st
        |      FROM l)
        |SELECT user_id, event_type, n, st[1] AS level, st[2] AS trend
        |FROM r ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // the STREAMING Holt operator, batch-evaluated BOUNDED: the
      // declared evaluation is holtSequential — repartition on the
      // series key, external (spillable, memory-tracked) sort, one
      // streaming group-boundary pass carrying 24 bytes of fold state —
      // which executes the IDENTICAL scalar steps in the identical
      // order as onlineHolt's state update, so level and trend compare
      // UNROUNDED against the oracle's sequential list_reduce (a
      // strictly stronger cross-engine pin than q_ts_holt's round(…,4)
      // over the regrouped chunked scan), while task memory no longer
      // hides a whole-series it.toSeq buffer on untracked JVM heap
      // (the r10 weak row; ScaleStress mode=long now measures this
      // query's flat peak directly). StreamingSpec pins
      // holtSequential == onlineHolt bit-for-bit on random data.
      // DYADIC α=1/4, β=1/8 are load-bearing: the Scala side computes
      // 1−α and 1−β at runtime while the oracle writes 0.75/0.875 as
      // literals, and for non-dyadic β (0.1) the real 1−β rounds to the
      // PREDECESSOR of the 0.9 literal — one ulp, a hash mismatch.
      // StreamingSpec drives the same op through MemoryStream splits;
      // this row pins the batch twin against DuckDB bit-for-bit.
      import s.implicits._
      graft.streaming.StreamingOps.holtSequential(
          Tables.measurements(s, d)
            .select(col("user_id"), col("event_type"), col("ts_us"),
              col("event_id"), col("cents"))
            .as[graft.streaming.StreamingOps.MeasK],
          alpha = 0.25, beta = 0.125)
        .toDF()
        .orderBy("user_id", "event_type")
    },

    QueryDef("q_ts_forecast",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |             CAST(round(value*100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT user_id, event_type,
        |        list(CAST(cents AS DOUBLE) ORDER BY ts_us, event_id) AS vs
        |      FROM s GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, CAST(len(vs) AS BIGINT) AS n,
        |        list_reduce(
        |          list_transform(vs, v -> [CAST(v AS DOUBLE), CAST(0.0 AS DOUBLE)]),
        |          (acc, e) -> [0.25 * e[1] + 0.75 * (acc[1] + acc[2]),
        |                       0.125 * ((0.25 * e[1] + 0.75 * (acc[1] + acc[2])) - acc[1]) + 0.875 * acc[2]]) AS st
        |      FROM l)
        |SELECT user_id, event_type, n,
        |  st[1] + 1 * st[2] AS f1,
        |  st[1] + 6 * st[2] AS f6,
        |  st[1] + 24 * st[2] AS f24
        |FROM r ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      // the FORECAST read (round 11) — "where is this series heading":
      // Holt's h-step-ahead prediction ŷ(h) = level + h·trend
      // projected at three horizons (next sample, +6, +24) from the
      // SAME bounded sequential evaluation q_stream_holt declares.
      // The projections are single IEEE multiply-adds over the
      // identical (level, trend) doubles both engines already fold to
      // bit-for-bit, so all three horizons compare UNROUNDED; the
      // integer horizon literals (1/6/24) are exact in both engines.
      // Plan cost: identical to q_stream_holt plus a three-column
      // Project — the fold is the work, the forecast is free.
      import s.implicits._
      graft.streaming.StreamingOps.holtSequential(
          Tables.measurements(s, d)
            .select(col("user_id"), col("event_type"), col("ts_us"),
              col("event_id"), col("cents"))
            .as[graft.streaming.StreamingOps.MeasK],
          alpha = 0.25, beta = 0.125)
        .toDF()
        .select(col("user_id"), col("event_type"), col("n"),
          (col("level") + lit(1) * col("trend")).as("f1"),
          (col("level") + lit(6) * col("trend")).as("f6"),
          (col("level") + lit(24) * col("trend")).as("f24"))
        .orderBy("user_id", "event_type")
    }
  )
}
