package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference TSDB's soul as reusable DataFrame transforms
  * (SURVEY.md §2 C). All operate on the long/narrow measurements view
  * (series key = (user_id, event_type), exact-integer mirrors `ts_us` /
  * `cents` / `wrapped` — see [[graft.Tables.measurements]]).
  *
  * Scale notes (100 TB):
  *  - every per-series op uses one window spec (partition by series,
  *    order by ts) → a single hash-partition exchange that Spark reuses
  *    across lag/rate/heartbeat columns; with a series-bucketed layout
  *    the exchange disappears entirely.
  *  - downsampling is a partial+final hash aggregate (map-side combine
  *    runs before the shuffle — bytes on the wire scale with
  *    series×slots, not rows).
  *  - the slot grid for gap-fill is generated, not materialized: a
  *    `sequence`+`explode` over a one-row relation, broadcast to the
  *    data side.
  */
object TimeSeriesOps {

  /** Per-series event-time window — THE ordering spec of the engine. */
  val seriesWindow =
    Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")

  /** Quantize epoch-µs to step-aligned epoch-second slots
    * [pub: tsdb/util.py calculate_slot — unverified, SURVEY.md §0].
    * Integer division keeps the math exact in both engines. */
  def slotSec(stepSec: Long): Column =
    expr(s"(ts_us div ${stepSec * 1000000L}) * $stepSec")

  /** Counter → wrap-corrected delta + rate columns.
    * Uses the native `wrap_delta` Catalyst expression when registered
    * (via [[graft.GraftExtensions]]); falls back to the equivalent
    * built-in arithmetic otherwise. Adds:
    * `prev_wrapped, prev_ts_us, delta_cents, dt_us, rate`. */
  def withRate(spark: SparkSession, m: DataFrame): DataFrame = {
    val cap = Tables.WrapCap
    val wrapDelta: Column =
      if (spark.catalog.functionExists("wrap_delta"))
        expr(s"wrap_delta(prev_wrapped, wrapped, ${cap}L)")
      else ((col("wrapped") - col("prev_wrapped")) % cap + cap) % cap
    m.withColumn("prev_wrapped", lag("wrapped", 1).over(seriesWindow))
      .withColumn("prev_ts_us", lag("ts_us", 1).over(seriesWindow))
      .withColumn("dt_us", col("ts_us") - col("prev_ts_us"))
      .withColumn("delta_cents", wrapDelta)
      .withColumn("rate",
        when(col("dt_us") > 0,
          col("delta_cents").cast("double") / lit(100.0) /
            (col("dt_us").cast("double") / lit(1000000.0))))
  }

  /** Heartbeat invalidation: a gap larger than `heartbeatSec` means the
    * poller was down — the bin is invalid (NULL), never interpolated
    * [pub: tsdb/aggregator.py heartbeat check — unverified]. */
  def withHeartbeat(df: DataFrame, heartbeatSec: Long): DataFrame =
    df.withColumn("valid", col("dt_us") <= heartbeatSec * 1000000L)
      .withColumn("rate_hb", when(col("valid"), col("rate")))

  /** Consolidate to `stepSec` bins: exact integer sum + count per
    * (series, slot); cf projections (avg/min/max/delta) derive from
    * these downstream so every engine computes identical doubles. */
  def downsample(m: DataFrame, stepSec: Long): DataFrame =
    m.groupBy(col("user_id"), col("event_type"), slotSec(stepSec).as("slot_ts"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))

  /** [[downsample]] plus the M4 endpoint pair (round 10): `first` /
    * `last` are the lexicographic min/max of struct(ts_us, event_id,
    * cents) per cell — i.e. the cell's earliest/latest sample with its
    * value riding along, tie-broken on the UNIQUE event_id like every
    * series window in the repo. Struct min/max is a monoid (field-wise
    * lexicographic order), so coarser levels merge cells with plain
    * min(first)/max(last) and argmin/argmax never re-scan raw — this
    * is what lets the M4 / min-max viz downsample family substitute
    * from the cascade like the sum/count rollups do. */
  def downsampleWide(m: DataFrame, stepSec: Long): DataFrame =
    m.groupBy(col("user_id"), col("event_type"), slotSec(stepSec).as("slot_ts"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        min(struct(col("ts_us"), col("event_id"), col("cents"))).as("first"),
        max(struct(col("ts_us"), col("event_id"), col("cents"))).as("last"))

  /** Dense slot grid over [beginSec, endSec) × distinct series, LEFT
    * JOIN'd to the downsampled data: one row per slot, NULL where no
    * valid samples — the API's value-per-slot contract. */
  def gapFill(spark: SparkSession, m: DataFrame,
              beginSec: Long, endSec: Long, stepSec: Long): DataFrame = {
    // Round 17 shape: downsample ONCE, fold each series' slot cells
    // into a per-series map, then explode the dense slot sequence and
    // look each grid slot up in the map. The former shape read `m`
    // twice (a distinct-series pass AND the downsample) and re-attached
    // the grid by a 3-key join; this one scans `m` once and replaces
    // the join with a generator + map lookup (guide §2.4 — the join and
    // one full input pass are gone). The series set is IDENTICAL: every
    // series of `m` owns ≥1 downsample cell, so the map-agg group keys
    // are exactly `select user_id, event_type distinct`, including
    // series with no samples inside [begin, end) (their lookups all
    // miss, reproducing the old all-NULL left-join rows). Missing slots
    // return a NULL struct → NULL n/sum/min/max, bit-identical to the
    // left join. Per-series state is one map entry per ACTIVE slot of
    // that series (bounded by its time span / step — the same class as
    // any per-series window here), and the output lands partitioned by
    // (user_id, event_type), which downstream per-series windows reuse
    // without a new exchange.
    val cell = struct(col("n"), col("sum_cents"), col("min_cents"), col("max_cents"))
    val inGrid = col("slot_ts") >= beginSec && col("slot_ts") < endSec
    downsample(m, stepSec)
      // Round 18: RANGE-partition by series here, once, instead of the
      // hash exchange the map-agg would plan. RangePartitioning(u, e)
      // satisfies ClusteredDistribution(u, e) (the map-agg and every
      // downstream per-series window run with NO further exchange) AND
      // OrderedDistribution with any (u, e, …) prefix — so the callers'
      // final `orderBy(user_id, event_type, slot_ts)` plans as a local
      // sort with NO Exchange rangepartitioning on top. That final
      // exchange was the expensive one: range exchanges SAMPLE their
      // child for partition boundaries, re-executing everything since
      // the last materialized shuffle (q_ts_gap_interp's double-window
      // tail ran twice per run — the round-17 persist existed only to
      // absorb that). Here the sampling pass reads the downsample's
      // already-materialized shuffle output — cheap at any scale — and
      // the persist is gone (guide §2.4: two exchanges → one, no cache).
      .repartitionByRange(col("user_id"), col("event_type"))
      .groupBy("user_id", "event_type")
      // Round 18 (VERDICT r17 #2 / ADVICE): collect ONLY cells inside
      // the requested [beginSec, endSec) grid — collect_list skips the
      // NULLs the `when` yields for out-of-range cells, so the
      // per-series map is bounded by the REQUESTED window (grid span /
      // step entries), never by the series' whole history (a declarative
      // agg buffer does not spill, and one UnsafeRow value caps at
      // ~2 GB). Group keys are unchanged — a series whose samples all
      // fall outside the grid still groups (empty map → every lookup
      // NULL, bit-identical to the old left-join all-NULL rows;
      // TimeSeriesPropsSpec pins it).
      .agg(map_from_entries(collect_list(
        when(inGrid, struct(col("slot_ts"), cell)))).as("slots"))
      .select(col("user_id"), col("event_type"),
        explode(sequence(lit(beginSec), lit(endSec - stepSec), lit(stepSec))).as("slot_ts"),
        col("slots"))
      .select(col("user_id"), col("event_type"), col("slot_ts"),
        col("slots")(col("slot_ts")).as("cell"))
      .select(col("user_id"), col("event_type"), col("slot_ts"),
        col("cell.n").as("n"), col("cell.sum_cents").as("sum_cents"),
        col("cell.min_cents").as("min_cents"), col("cell.max_cents").as("max_cents"))
  }

  /** Per-series EMA at the last sample WITHOUT a whole-series collect
    * (VERDICT r5 wrong #1). An EMA step acc' = α·x + β·acc is the
    * affine map f(acc) = β·acc + α·x, and affine maps compose
    * associatively: (a₂,b₂)∘(a₁,b₁) = (a₂·a₁, a₂·b₁ + b₂). So the
    * sequential fold factors into per-chunk folds of (a,b) coefficient
    * pairs plus an in-order combine of one pair per chunk:
    *  - level 1 groups rows into fixed-size chunks by per-series
    *    row_number — task memory is bounded by `chunkSize`, never by
    *    series length;
    *  - level 2 combines the ≤ n/chunkSize chunk pairs in chunk order
    *    (a 10-year 10 s-poll series ≈ 31M samples → ~7.7k pairs, vs a
    *    single 31M-element task array in the collect form).
    * Chunk membership is deterministic (row_number over the series
    * order), so the result is partitioning-INVARIANT — but the
    * regrouped double arithmetic is not bit-identical to the strictly
    * sequential fold in general: EmaSpec pins exact equality on
    * dyadic-rational inputs (where both orders are exact) and ~1e-12
    * relative agreement on 10⁵ random samples.
    *
    * Input: (user_id, event_type, ts_us, event_id, v). Output: one row
    * per series (user_id, event_type, n, ema), the fold seeded at the
    * series' first value. α and β are taken as SEPARATE literals so the
    * caller controls both doubles exactly (β is usually 1−α, but 1−α
    * re-rounds). */
  def emaChunked(m: DataFrame, alpha: Double, beta: Double,
                 chunkSize: Int = 4096): DataFrame = {
    require(chunkSize > 1, s"chunkSize must be > 1: $chunkSize")
    val pair = // per-chunk affine coefficients, folded in row order
      s"""aggregate(steps,
         |  named_struct('a', CAST(1.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)),
         |  (acc, x) -> named_struct('a', $beta * acc.a,
         |                           'b', $alpha * x + $beta * acc.b))""".stripMargin
    val combine = // chunk pairs composed in chunk order
      s"""aggregate(chunks,
         |  named_struct('a', CAST(1.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)),
         |  (acc, c) -> named_struct('a', c.a * acc.a, 'b', c.a * acc.b + c.b))""".stripMargin
    m.withColumn("rn", row_number().over(seriesWindow))
      .withColumn("chunk", expr(s"(rn - 1) div $chunkSize"))
      .groupBy("user_id", "event_type", "chunk")
      .agg(sort_array(collect_list(struct(col("rn"), col("v")))).as("arr"),
        min("rn").as("min_rn"), count(lit(1)).as("cnt"))
      .withColumn("vs", expr("transform(arr, r -> r.v)"))
      // the series' very first value SEEDS the fold; all others are steps
      .withColumn("steps",
        when(col("min_rn") === 1, expr("slice(vs, 2, size(vs) - 1)"))
          .otherwise(col("vs")))
      .withColumn("seed", when(col("min_rn") === 1, expr("element_at(vs, 1)")))
      .withColumn("ab", expr(pair))
      .groupBy("user_id", "event_type")
      .agg(sort_array(collect_list(struct(col("chunk"),
          col("ab.a").as("a"), col("ab.b").as("b"),
          col("seed"), col("cnt")))).as("chunks"),
        sum("cnt").as("n"))
      .withColumn("tot", expr(combine))
      .select(col("user_id"), col("event_type"), col("n"),
        (col("tot.a") * expr("chunks[0].seed") + col("tot.b")).as("ema"))
  }

  /** Per-series Holt double-exponential smoothing (level + linear
    * trend) at the last sample — [[emaChunked]]'s associative-scan
    * trick one dimension up. The Holt step
    *
    *   l' = α·x + (1−α)(l + b);  b' = β(l' − l) + (1−β)·b
    *
    * is an affine map on the 2-vector (l, b): s' = M·s + x·c with the
    * CONSTANT matrix M = [[1−α, 1−α], [−αβ, 1−αβ]] and c = (α, αβ).
    * Affine maps compose associatively — (A₂,v₂)∘(A₁,v₁) =
    * (A₂A₁, A₂v₁+v₂) — so the inherently-sequential-looking recurrence
    * factors into per-chunk folds of (2×2 matrix, 2-vector) pairs plus
    * an in-order combine of one pair per chunk, exactly like the EMA:
    * per-task memory is bounded by `chunkSize` PLUS one (2×2 matrix,
    * vector, seed) struct per chunk — the second-stage collect_list
    * holds n/chunkSize pairs per series, the same asymptotics as
    * [[emaChunked]] (≈88 bytes per 4096 samples, so a billion-sample
    * series costs ~21 MB at the default chunk size) — and
    * chunk membership is deterministic (row_number over the series
    * order) so the result is partitioning-INVARIANT — HoltSpec pins
    * bit-identical results at 1/4/32 input partitions. Regrouped
    * double arithmetic is not bit-identical to the sequential fold;
    * HoltSpec pins exact equality on dyadic inputs across chunk sizes
    * and 1e-9 relative agreement on 10⁵ random samples (the q_ts_holt
    * oracle hashes behind round(…,4), like the EMA).
    *
    * Seed: (l₁, b₁) = (x₁, 0) — the first sample is the level, trend
    * starts flat; rows 2… are steps. Output: one row per series
    * (user_id, event_type, n, level, trend). */
  def holtChunked(m: DataFrame, alpha: Double, beta: Double,
                  chunkSize: Int = 4096): DataFrame = {
    require(chunkSize > 1, s"chunkSize must be > 1: $chunkSize")
    val (m11, m12) = (1.0 - alpha, 1.0 - alpha)
    val (m21, m22) = (-alpha * beta, 1.0 - alpha * beta)
    val (c1, c2) = (alpha, alpha * beta)
    val id = "named_struct('a11', CAST(1.0 AS DOUBLE), 'a12', CAST(0.0 AS DOUBLE), " +
      "'a21', CAST(0.0 AS DOUBLE), 'a22', CAST(1.0 AS DOUBLE), " +
      "'v1', CAST(0.0 AS DOUBLE), 'v2', CAST(0.0 AS DOUBLE))"
    val pair = // fold the chunk's steps in row order: acc ← (M, x·c)∘acc
      s"""aggregate(steps, $id,
         |  (acc, x) -> named_struct(
         |    'a11', $m11 * acc.a11 + $m12 * acc.a21,
         |    'a12', $m11 * acc.a12 + $m12 * acc.a22,
         |    'a21', $m21 * acc.a11 + $m22 * acc.a21,
         |    'a22', $m21 * acc.a12 + $m22 * acc.a22,
         |    'v1', $m11 * acc.v1 + $m12 * acc.v2 + $c1 * x,
         |    'v2', $m21 * acc.v1 + $m22 * acc.v2 + $c2 * x))""".stripMargin
    val combine = // chunk pairs composed in chunk order: acc ← C∘acc
      s"""aggregate(chunks, $id,
         |  (acc, c) -> named_struct(
         |    'a11', c.a11 * acc.a11 + c.a12 * acc.a21,
         |    'a12', c.a11 * acc.a12 + c.a12 * acc.a22,
         |    'a21', c.a21 * acc.a11 + c.a22 * acc.a21,
         |    'a22', c.a21 * acc.a12 + c.a22 * acc.a22,
         |    'v1', c.a11 * acc.v1 + c.a12 * acc.v2 + c.v1,
         |    'v2', c.a21 * acc.v1 + c.a22 * acc.v2 + c.v2))""".stripMargin
    m.withColumn("rn", row_number().over(seriesWindow))
      .withColumn("chunk", expr(s"(rn - 1) div $chunkSize"))
      .groupBy("user_id", "event_type", "chunk")
      .agg(sort_array(collect_list(struct(col("rn"), col("v")))).as("arr"),
        min("rn").as("min_rn"), count(lit(1)).as("cnt"))
      .withColumn("vs", expr("transform(arr, r -> r.v)"))
      .withColumn("steps",
        when(col("min_rn") === 1, expr("slice(vs, 2, size(vs) - 1)"))
          .otherwise(col("vs")))
      .withColumn("seed", when(col("min_rn") === 1, expr("element_at(vs, 1)")))
      .withColumn("ab", expr(pair))
      .groupBy("user_id", "event_type")
      .agg(sort_array(collect_list(struct(col("chunk"),
          col("ab.a11").as("a11"), col("ab.a12").as("a12"),
          col("ab.a21").as("a21"), col("ab.a22").as("a22"),
          col("ab.v1").as("v1"), col("ab.v2").as("v2"),
          col("seed")))).as("chunks"),
        sum("cnt").as("n"))
      .withColumn("tot", expr(combine))
      // seed vector is (x₁, 0): level = a11·x₁ + v1, trend = a21·x₁ + v2
      .select(col("user_id"), col("event_type"), col("n"),
        (col("tot.a11") * expr("chunks[0].seed") + col("tot.v1")).as("level"),
        (col("tot.a21") * expr("chunks[0].seed") + col("tot.v2")).as("trend"))
  }

  /** Exact largest-triangle-three-buckets downsample (round 10 — the
    * sequential companion to the parallel LTOB in q_ts_downsample_tri),
    * bucketed on TIME SLOTS of `stepSec`:
    *
    *  - the series' first point is the anchor (always emitted; the rest
    *    of its slot belongs to the anchor bucket and yields no second
    *    candidate),
    *  - every middle slot emits the point maximizing the triangle area
    *    against the PREVIOUSLY CHOSEN point and the NEXT slot's
    *    centroid — the true LTTB chain, where each pick feeds the next
    *    bucket's triangle,
    *  - the last slot emits the series' last point (and a single-slot
    *    series emits first + last).
    *
    * The chain is inherently sequential per series (each pick depends
    * on the previous pick — the reason q_ts_downsample_tri deliberately
    * chose LTOB for the default viz path), but it is NOT a driver loop:
    * the plan is one hash exchange on the series key, an in-partition
    * sort, and a streaming per-partition fold holding at most TWO slot
    * buffers per series (decide slot i when slot i+1 completes) — at
    * 100 TB it parallelizes across series exactly like a window op,
    * with task memory bounded by poll density × step, never by series
    * length. Ties take the earliest (ts_us, event_id); twice-area is
    * computed in doubles (the next-slot centroid is rational, so exact
    * int64 cross products are unavailable — acceptable for a
    * no-oracle viz operator, deterministic for a fixed input order).
    *
    * Input: the measurements view. Output: (user_id, event_type,
    * slot_ts, ts_us, value) — one row per (series, bucket). */
  def lttb(m: DataFrame, stepSec: Long): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive: $stepSec")
    val stepUs = stepSec * 1000000L
    val spark = m.sparkSession
    import spark.implicits._
    type Pt = (Long, Long, Long) // (ts_us, event_id, cents)
    val sorted = m
      .select(col("user_id"), col("event_type"), col("ts_us"),
        col("event_id"), col("cents"))
      .repartition(col("user_id"), col("event_type"))
      .sortWithinPartitions("user_id", "event_type", "ts_us", "event_id")
      .as[(Long, String, Long, Long, Long)]
    // (uid, etype, slot_ts, ts_us, cents) rows out of the fold
    val picked = sorted.mapPartitions {
      (rows: Iterator[(Long, String, Long, Long, Long)]) =>
      new Iterator[(Long, String, Long, Long, Long)] {
        private val outQ =
          scala.collection.mutable.Queue.empty[(Long, String, Long, Long, Long)]
        private var curUid = 0L
        private var curEtype: String = null
        private var inSeries = false
        private var anchor: Pt = null
        private var prevChosen: Pt = null
        private val bufA = scala.collection.mutable.ArrayBuffer.empty[Pt]
        private val bufB = scala.collection.mutable.ArrayBuffer.empty[Pt]
        private var slotA = 0L // slot id (ts_us div stepUs) of bufA
        private var slotB = 0L
        private var lastPt: Pt = null // last point seen in the series

        private def slotOf(tsUs: Long): Long = tsUs / stepUs
        private def emit(slot: Long, p: Pt): Unit = {
          outQ.enqueue((curUid, curEtype, slot * stepSec, p._1, p._3))
          prevChosen = p
        }
        // twice the triangle area of (prevChosen, p, centroid) —
        // argmax with earliest-(ts, eid) tie-break
        private def decide(buf: scala.collection.mutable.ArrayBuffer[Pt],
                           cTs: Double, cV: Double): Pt = {
          var best: Pt = null
          var bestArea = -1.0
          val (px, py) = (prevChosen._1.toDouble, prevChosen._3.toDouble)
          var i = 0
          while (i < buf.length) {
            val p = buf(i)
            val area = math.abs(
              (p._1 - px) * (cV - py) - (cTs - px) * (p._3 - py))
            if (area > bestArea) { bestArea = area; best = p }
            i += 1
          }
          best
        }
        private def centroid(buf: scala.collection.mutable.ArrayBuffer[Pt])
            : (Double, Double) = {
          var (st, sv) = (0.0, 0.0)
          buf.foreach { p => st += p._1; sv += p._3 }
          (st / buf.length, sv / buf.length)
        }
        private def endSeries(): Unit = {
          // bufA (if any) is the second-to-last open slot: decide it
          // against bufB's centroid; bufB (or bufA when B is empty) is
          // the LAST slot — emit its last point unless it IS the anchor
          if (bufB.nonEmpty) {
            val (cTs, cV) = centroid(bufB)
            emit(slotA, decide(bufA, cTs, cV))
            emit(slotB, bufB.last)
          } else if (bufA.nonEmpty) {
            emit(slotA, bufA.last)
          } else if (lastPt != null && lastPt != anchor) {
            // single-slot series: keep first AND last like classic LTTB
            emit(slotOf(lastPt._1), lastPt)
          }
          bufA.clear(); bufB.clear(); inSeries = false; lastPt = null
        }
        private def startSeries(uid: Long, et: String, p: Pt): Unit = {
          curUid = uid; curEtype = et; inSeries = true
          anchor = p; prevChosen = p
          emit(slotOf(p._1), p)
          prevChosen = p
          bufA.clear(); bufB.clear()
          slotA = slotOf(p._1) // anchor's slot absorbs its remainder
        }
        private def push(p: Pt): Unit = {
          lastPt = p
          val s = slotOf(p._1)
          if (s == slotA && bufB.isEmpty && (anchor ne null) &&
              slotA == slotOf(anchor._1) && bufA.isEmpty) {
            () // rest of the anchor's own slot: no second candidate
          } else if (bufA.isEmpty && bufB.isEmpty) {
            slotA = s; bufA += p
          } else if (s == slotA && bufB.isEmpty) {
            bufA += p
          } else if (bufB.isEmpty || s == slotB) {
            if (bufB.isEmpty) slotB = s
            if (s == slotB) bufB += p
          } else {
            // slot B is complete: decide slot A against B's centroid,
            // shift B → A, start the new slot
            val (cTs, cV) = centroid(bufB)
            emit(slotA, decide(bufA, cTs, cV))
            bufA.clear(); bufA ++= bufB; slotA = slotB
            bufB.clear(); bufB += p; slotB = s
          }
        }
        private def advance(): Unit = {
          while (outQ.isEmpty && rows.hasNext) {
            val (uid, et, ts, eid, cents) = rows.next()
            if (!inSeries || uid != curUid || et != curEtype) {
              if (inSeries) endSeries()
              startSeries(uid, et, (ts, eid, cents))
            } else push((ts, eid, cents))
          }
          if (outQ.isEmpty && !rows.hasNext && inSeries) endSeries()
        }
        override def hasNext: Boolean = { advance(); outQ.nonEmpty }
        override def next(): (Long, String, Long, Long, Long) = {
          advance(); outQ.dequeue()
        }
      }
    }
    picked.toDF("user_id", "event_type", "slot_ts", "ts_us", "cents")
      .select(col("user_id"), col("event_type"), col("slot_ts"),
        col("ts_us"), (col("cents").cast("double") / 100.0).as("value"))
  }

  /** Latest valid sample per series — TSDBVar MAX_TIMESTAMP metadata. */
  def lastValue(m: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    m.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
