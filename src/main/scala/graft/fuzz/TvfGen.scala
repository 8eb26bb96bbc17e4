package graft.fuzz

import scala.util.Random

/** Seeded fuzz over the SQL TABLE-FUNCTION surface (round 14, VERDICT
  * r13 next #6). QueryGen covers the relational core; this generator
  * puts the `graft_fetch*` TVF TEXT path — literal-argument parsing,
  * plan resolution through GraftExtensions, cf dispatch, grid
  * generation — under the same seeded differential pressure:
  * store-valid random parameter draws (series key × half-open range ×
  * cascade step × consolidation function), each rendered as a Spark
  * TVF call plus a DuckDB oracle that recomputes the same read from
  * raw `events`, using EXACTLY the proven oracle templates of the
  * declared q_store_* and q_sql_*_tvf queries (same §7.4-safe cents
  * arithmetic, same IEEE op order, same ORDER BY).
  *
  * Parameter space deliberately includes what the declared queries
  * pin only at fixed points: slot-UNALIGNED begin/end (slotRead's
  * `slot_ts >= B AND slot_ts < E` filter is the contract either way),
  * ranges overhanging the data span on both sides, empty ranges,
  * series keys with no data, every value cf {average,min,max,sum,raw,
  * first,last}, both counter cfs {delta,rate}, both cascade steps,
  * bulk series lists, the dense-grid filled reads (single-series AND
  * bulk), and sub-K-exact quantile reads (step-ALIGNED bounds —
  * fetchQuantile's raw-ts
  * semantics and the slot filter only coincide on aligned ranges,
  * which is also how the declared oracle pins it).
  *
  * The Spark text carries a `__STORE__` placeholder; the runner
  * (graft.Fuzz) substitutes the session's store-fixture path — the
  * DuckDB side never needs it (it reads the `events` view the fixture
  * was ingested from). */
object TvfGen {
  import QueryGen.FuzzQuery

  private val Etypes = Seq("click", "view", "purchase", "signup", "error")
  private val Steps = Seq(21600L, 86400L)
  private val ValueCfs =
    Seq("average", "min", "max", "sum", "raw", "first", "last")
  // driver events span 2024-01-01 .. 2024-01-31; draws overhang both ends
  private val SpanB = 1704067200L
  private val SpanE = 1706659200L

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  /** Random half-open [b, e), e > b, possibly overhanging the data. */
  private def randRange(r: Random): (Long, Long) = {
    val b = r.between(SpanB - 2L * 86400L, SpanE + 86400L)
    val len = r.between(7200L, 12L * 86400L)
    (b, b + len)
  }

  private def cents(col: String = "value") =
    s"CAST(round($col*100) AS BIGINT)"

  /** Per-slot consolidated SELECT items for a value cf — the exact
    * expressions of the declared oracles (q_store_fetch_agg/_last/
    * _first and the min/max/sum TVF rows), so the IEEE op order
    * matches cfColumn's. */
  private def cfAggSql(cf: String): String = cf match {
    case "average" =>
      "CAST(sum(cents) AS DOUBLE)/100.0/CAST(count(*) AS DOUBLE)"
    case "min" => "CAST(min(cents) AS DOUBLE)/100.0"
    case "max" => "CAST(max(cents) AS DOUBLE)/100.0"
    case "sum" => "CAST(sum(cents) AS DOUBLE)/100.0"
    case "raw" => "CAST(count(*) AS DOUBLE)"
    case "first" =>
      "CAST(first(cents ORDER BY ts_us, event_id) AS DOUBLE)/100.0"
    case "last" =>
      "CAST(last(cents ORDER BY ts_us, event_id) AS DOUBLE)/100.0"
    case other => throw new IllegalArgumentException(other)
  }

  private def fetchAgg(r: Random): (String, String) = {
    val (uid, et) = (r.nextInt(15), pick(r, Etypes))
    val step = pick(r, Steps)
    val cf = pick(r, ValueCfs)
    val (b, e) = randRange(r)
    val spark =
      s"SELECT * FROM graft_fetch('__STORE__', $uid, '$et', $b, $e, $step, '$cf')"
    val duck =
      s"""WITH c AS (
         |  SELECT (epoch_us(ts) // ${step}000000) * $step AS slot_ts,
         |         epoch_us(ts) AS ts_us, event_id, ${cents()} AS cents
         |  FROM events WHERE user_id = $uid AND event_type = '$et'
         |)
         |SELECT slot_ts, ${cfAggSql(cf)} AS value
         |FROM c WHERE slot_ts >= $b AND slot_ts < $e
         |GROUP BY slot_ts ORDER BY slot_ts""".stripMargin
    (spark, duck)
  }

  private def fetchRaw(r: Random): (String, String) = {
    val (uid, et) = (r.nextInt(15), pick(r, Etypes))
    val (b, e) = randRange(r)
    val spark = s"SELECT * FROM graft_fetch('__STORE__', $uid, '$et', $b, $e)"
    val duck =
      s"""SELECT epoch_us(ts) AS ts_us,
         |  CAST(${cents()} AS DOUBLE)/100.0 AS value
         |FROM events
         |WHERE user_id = $uid AND event_type = '$et'
         |  AND epoch_us(ts) >= ${b}000000 AND epoch_us(ts) < ${e}000000
         |ORDER BY ts_us""".stripMargin
    (spark, duck)
  }

  /** Counter cfs, both steps — the q_store_fetch_rate/_rate_avg
    * templates with the fixture layout's wrap cap (1e6 cents) and
    * heartbeat (21600 s). Deltas attach to the CURRENT sample's slot;
    * the previous sample may precede the range (the cascade is built
    * from full history), exactly as the declared oracles encode. */
  private def fetchCounter(r: Random): (String, String) = {
    val (uid, et) = (r.nextInt(15), pick(r, Etypes))
    val step = pick(r, Steps)
    val isRate = r.nextBoolean()
    val (b, e) = randRange(r)
    val cf = if (isRate) "rate" else "delta"
    val spark =
      s"SELECT * FROM graft_fetch('__STORE__', $uid, '$et', $b, $e, $step, '$cf')"
    val valueSql =
      if (isRate)
        s"""CASE WHEN sum(ts_us - prev_ts_us) > 0 THEN
           |    (CAST(sum(((cents - prev_cents) % 1000000 + 1000000) % 1000000) AS DOUBLE)/100.0)
           |    / (CAST(sum(ts_us - prev_ts_us) AS DOUBLE)/1000000.0) END""".stripMargin
      else
        "CAST(sum(((cents - prev_cents) % 1000000 + 1000000) % 1000000) AS DOUBLE)/100.0"
    val duck =
      s"""WITH s AS (
         |  SELECT epoch_us(ts) AS ts_us, event_id, ${cents()} AS cents
         |  FROM events WHERE user_id = $uid AND event_type = '$et'
         |), r AS (
         |  SELECT ts_us, cents,
         |         lag(cents) OVER w AS prev_cents,
         |         lag(ts_us) OVER w AS prev_ts_us
         |  FROM s WINDOW w AS (ORDER BY ts_us, event_id)
         |)
         |SELECT (ts_us // ${step}000000) * $step AS slot_ts,
         |  $valueSql AS value
         |FROM r
         |WHERE prev_ts_us IS NOT NULL AND ts_us - prev_ts_us <= 21600000000
         |  AND (ts_us // ${step}000000) * $step >= $b
         |  AND (ts_us // ${step}000000) * $step < $e
         |GROUP BY 1 ORDER BY slot_ts""".stripMargin
    (spark, duck)
  }

  private def fetchBulk(r: Random): (String, String) = {
    val step = pick(r, Steps)
    val cf = pick(r, ValueCfs)
    val (b, e) = randRange(r)
    val series = (0 until r.nextInt(3) + 1)
      .map(_ => (r.nextInt(15), pick(r, Etypes))).distinct
    val tail = series.map { case (u, t) => s"$u, '$t'" }.mkString(", ")
    val pred = series.map { case (u, t) =>
      s"(user_id = $u AND event_type = '$t')" }.mkString(" OR ")
    val spark =
      s"SELECT * FROM graft_fetch_bulk('__STORE__', $b, $e, $step, '$cf', $tail)"
    val duck =
      s"""WITH c AS (
         |  SELECT user_id, event_type,
         |         (epoch_us(ts) // ${step}000000) * $step AS slot_ts,
         |         epoch_us(ts) AS ts_us, event_id, ${cents()} AS cents
         |  FROM events WHERE $pred
         |)
         |SELECT user_id, event_type, slot_ts, ${cfAggSql(cf)} AS value
         |FROM c WHERE slot_ts >= $b AND slot_ts < $e
         |GROUP BY user_id, event_type, slot_ts
         |ORDER BY user_id, event_type, slot_ts""".stripMargin
    (spark, duck)
  }

  private def fetchFilled(r: Random): (String, String) = {
    val (uid, et) = (r.nextInt(15), pick(r, Etypes))
    val step = pick(r, Steps)
    val cf = pick(r, ValueCfs)
    val (b, e) = randRange(r)
    val firstSlot = Math.floorDiv(b, step) * step
    val spark =
      s"SELECT * FROM graft_fetch_filled('__STORE__', $uid, '$et', $b, $e, $step, '$cf')"
    val duck =
      s"""WITH c AS (
         |  SELECT (epoch_us(ts) // ${step}000000) * $step AS slot_ts,
         |         epoch_us(ts) AS ts_us, event_id, ${cents()} AS cents
         |  FROM events WHERE user_id = $uid AND event_type = '$et'
         |), h AS (
         |  SELECT slot_ts, ${cfAggSql(cf)} AS v
         |  FROM c WHERE slot_ts >= $firstSlot AND slot_ts < $e GROUP BY slot_ts
         |)
         |SELECT g.slot_ts, h.v AS value
         |FROM range($firstSlot, $e, $step) g(slot_ts)
         |LEFT JOIN h ON h.slot_ts = g.slot_ts
         |ORDER BY g.slot_ts""".stripMargin
    (spark, duck)
  }

  /** fill = interp — the q_store_fetch_interp template parameterized:
    * interior gaps interpolate between nearest valid neighbours via
    * the SAME IEEE tree both engines evaluate; leading/trailing gaps
    * stay NULL. cfs restricted to the endpoint/extremum family so
    * present-slot values are exact two-decimal doubles (the declared
    * query's convention — interpolating between computed averages
    * would also match, but this keeps the draw inside the pinned
    * contract). */
  private def fetchInterp(r: Random): (String, String) = {
    val (uid, et) = (r.nextInt(15), pick(r, Etypes))
    val step = pick(r, Steps)
    val cf = pick(r, Seq("min", "max", "first", "last"))
    val (b, e) = randRange(r)
    val firstSlot = Math.floorDiv(b, step) * step
    val spark =
      s"SELECT * FROM graft_fetch_filled('__STORE__', $uid, '$et', $b, $e, $step, '$cf', 'interp')"
    val duck =
      s"""WITH c AS (
         |  SELECT (epoch_us(ts) // ${step}000000) * $step AS slot_ts,
         |         epoch_us(ts) AS ts_us, event_id, ${cents()} AS cents
         |  FROM events WHERE user_id = $uid AND event_type = '$et'
         |), h AS (
         |  SELECT slot_ts, ${cfAggSql(cf)} AS v
         |  FROM c WHERE slot_ts >= $firstSlot AND slot_ts < $e GROUP BY slot_ts
         |), gf AS (
         |  SELECT g.slot_ts, h.v
         |  FROM range($firstSlot, $e, $step) g(slot_ts)
         |  LEFT JOIN h ON h.slot_ts = g.slot_ts
         |), n AS (
         |  SELECT slot_ts, v,
         |    max(CASE WHEN v IS NOT NULL THEN slot_ts END) OVER wp AS prev_ts,
         |    last_value(v IGNORE NULLS) OVER wp AS prev_val,
         |    min(CASE WHEN v IS NOT NULL THEN slot_ts END) OVER wf AS next_ts,
         |    first_value(v IGNORE NULLS) OVER wf AS next_val
         |  FROM gf
         |  WINDOW wp AS (ORDER BY slot_ts
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wf AS (ORDER BY slot_ts
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |)
         |SELECT slot_ts,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
         |       ELSE prev_val + (next_val - prev_val) *
         |            (CAST(slot_ts - prev_ts AS DOUBLE) / CAST(next_ts - prev_ts AS DOUBLE))
         |  END AS value
         |FROM n ORDER BY slot_ts""".stripMargin
    (spark, duck)
  }

  private def fetchBulkFilled(r: Random): (String, String) = {
    val step = pick(r, Steps)
    val cf = pick(r, ValueCfs)
    val (b, e) = randRange(r)
    val firstSlot = Math.floorDiv(b, step) * step
    val series = (0 until r.nextInt(2) + 1)
      .map(_ => (r.nextInt(15), pick(r, Etypes))).distinct
    val tail = series.map { case (u, t) => s"$u, '$t'" }.mkString(", ")
    val pred = series.map { case (u, t) =>
      s"(user_id = $u AND event_type = '$t')" }.mkString(" OR ")
    val vals = series.map { case (u, t) => s"($u, '$t')" }.mkString(", ")
    val spark =
      s"SELECT * FROM graft_fetch_bulk_filled('__STORE__', $b, $e, $step, '$cf', $tail)"
    val duck =
      s"""WITH c AS (
         |  SELECT user_id, event_type,
         |         (epoch_us(ts) // ${step}000000) * $step AS slot_ts,
         |         epoch_us(ts) AS ts_us, event_id, ${cents()} AS cents
         |  FROM events WHERE $pred
         |), h AS (
         |  SELECT user_id, event_type, slot_ts, ${cfAggSql(cf)} AS v
         |  FROM c WHERE slot_ts >= $firstSlot AND slot_ts < $e
         |  GROUP BY user_id, event_type, slot_ts
         |)
         |SELECT CAST(k.user_id AS BIGINT) AS user_id, k.event_type,
         |  g.slot_ts, h.v AS value
         |FROM range($firstSlot, $e, $step) g(slot_ts)
         |CROSS JOIN (VALUES $vals) k(user_id, event_type)
         |LEFT JOIN h ON h.user_id = k.user_id AND h.event_type = k.event_type
         |  AND h.slot_ts = g.slot_ts
         |ORDER BY k.user_id, k.event_type, g.slot_ts""".stripMargin
    (spark, duck)
  }

  private def fetchQuantile(r: Random): (String, String) = {
    val (uid, et) = (r.nextInt(15), pick(r, Etypes))
    val step = pick(r, Steps)
    val q = pick(r, Seq("0.25", "0.5", "0.9", "0.95", "0.99"))
    // step-aligned bounds: fetchQuantile's contract is raw-ts range =
    // slot range, which only coincide on aligned requests
    val (b0, e0) = randRange(r)
    val b = Math.floorDiv(b0, step) * step
    val e = math.max(b + step, Math.floorDiv(e0, step) * step)
    val spark =
      s"SELECT * FROM graft_fetch_quantile('__STORE__', $uid, '$et', $b, $e, $step, $q)"
    val duck =
      s"""WITH c AS (
         |  SELECT (epoch_us(ts) // ${step}000000) * $step AS slot_ts,
         |    ${cents()} AS cents
         |  FROM events WHERE user_id = $uid AND event_type = '$et'
         |    AND epoch_us(ts) >= ${b}000000 AND epoch_us(ts) < ${e}000000
         |), r AS (
         |  SELECT slot_ts, cents,
         |    row_number() OVER (PARTITION BY slot_ts ORDER BY cents) AS rn,
         |    count(*) OVER (PARTITION BY slot_ts) AS n
         |  FROM c
         |)
         |SELECT slot_ts, CAST(cents AS DOUBLE)/100.0 AS value
         |FROM r WHERE rn = greatest(1, CAST(ceil($q * n) AS BIGINT))
         |ORDER BY slot_ts""".stripMargin
    (spark, duck)
  }

  def generate(seed: Long, n: Int): Seq[FuzzQuery] =
    (0 until n).map { i =>
      val r = new Random(seed * 7368787L + i)
      val (s, d) = r.nextInt(10) match {
        case 0 | 1 => fetchAgg(r)
        case 2 => fetchRaw(r)
        case 3 => fetchCounter(r)
        case 4 | 5 => fetchBulk(r)
        case 6 => fetchFilled(r)
        case 7 => fetchBulkFilled(r)
        case 8 => fetchInterp(r)
        case _ => fetchQuantile(r)
      }
      FuzzQuery(f"fz_tvf_${seed}_$i%04d", s, d)
    }
}
