package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.TimeSeriesOps

/** ScalaCheck properties for the TSDB core (SURVEY.md §5.3). */
class TimeSeriesPropsSpec extends SparkSpec {

  test("property: slot alignment is idempotent and lower-bounding") {
    val step = 21600L
    val prop = Prop.forAll(Gen.chooseNum(0L, 4102444800L)) { ts: Long =>
      val slot = ts / step * step
      slot / step * step == slot && slot <= ts && ts - slot < step
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("gap fill emits exactly series x slots rows") {
    val m = Tables.measurements(spark, Sf)
    val series = m.select("user_id", "event_type").distinct().count()
    val b = 1704067200L; val e = 1706659200L; val step = 21600L
    val filled = TimeSeriesOps.gapFill(spark, m, b, e, step)
    assert(filled.count() == series * ((e - b) / step))
  }

  test("gap fill keeps a series whose samples ALL fall outside the grid " +
       "(all-NULL rows), and in-grid cells match downsample") {
    // Pins the round-18 window-bounded map-agg (VERDICT r17 #2): the
    // when(inGrid, ...) filter must shrink the per-series map WITHOUT
    // shrinking the series set — a series with zero in-range samples
    // still groups (empty map) and emits one all-NULL row per slot,
    // exactly like the old distinct-series × grid left join.
    import spark.implicits._
    val b = 1704067200L; val e = b + 4 * 21600L; val step = 21600L
    val rows = Seq(
      // series (1, out): both samples BEFORE the grid
      (1L, "out", 900L, (b - 10 * step) * 1000000L, 100L),
      (1L, "out", 901L, (b - 9 * step) * 1000000L, 200L),
      // series (2, in): one sample in slot 0, one AFTER the grid
      (2L, "in", 902L, b * 1000000L + 5L, 300L),
      (2L, "in", 903L, (e + step) * 1000000L, 400L))
      .toDF("user_id", "event_type", "event_id", "ts_us", "cents")
    val out = TimeSeriesOps.gapFill(spark, rows, b, e, step).cache()
    try {
      assert(out.count() == 2 * 4, "2 series x 4 slots")
      val outSeries = out.filter(col("event_type") === "out")
      assert(outSeries.count() == 4, "out-of-range series keeps its grid rows")
      assert(outSeries.filter(col("n").isNotNull || col("sum_cents").isNotNull ||
        col("min_cents").isNotNull || col("max_cents").isNotNull).count() == 0,
        "out-of-range series rows are all-NULL")
      val hit = out.filter(col("event_type") === "in" && col("slot_ts") === b)
        .select("n", "sum_cents", "min_cents", "max_cents")
        .as[(Long, Long, Long, Long)].collect()
      assert(hit.sameElements(Array((1L, 300L, 300L, 300L))))
      assert(out.filter(col("event_type") === "in" && col("slot_ts") =!= b)
        .filter(col("n").isNotNull).count() == 0,
        "the in-series' other slots (incl. the post-grid sample's) are NULL")
    } finally out.unpersist()
  }

  test("downsample of a constant series is constant") {
    import spark.implicits._
    val const = (0 until 100).map(i => (1L, "g", i.toLong, 1704067200000000L + i * 60000000L, 500L))
      .toDF("user_id", "event_id", "ignore", "ts_us", "cents")
      .select("user_id", "event_id", "ts_us", "cents")
      .withColumn("event_type", lit("g"))
    val ds = TimeSeriesOps.downsample(const, 3600L)
    val avgs = ds.select((col("sum_cents").cast("double") / col("n")).as("a"))
      .as[Double].collect()
    assert(avgs.nonEmpty && avgs.forall(_ == 500.0))
  }

  test("delta distribution conserves each pair's delta exactly") {
    val out = SparkEntry.queries("q_ts_delta_distribute")(spark, Sf)
    val ref = TimeSeriesOps.withRate(spark, Tables.measurements(spark, Sf))
      .filter(col("prev_ts_us").isNotNull && col("dt_us") > 0 &&
        col("dt_us") <= 21600L * 1000000L)
      .select(col("event_id"), (col("delta_cents").cast("double") / 100.0).as("delta"))
    val sums = out.groupBy("event_id").agg(sum("portion").as("sum_p"))
      .join(ref, "event_id")
      .filter(abs(col("sum_p") - col("delta")) > 1e-9)
    assert(sums.count() == 0, "portions do not sum back to the delta")
    // and overlap partitions the pair interval
    val overlaps = out.groupBy("event_id").agg(sum("overlap_us").as("o"))
      .join(TimeSeriesOps.withRate(spark, Tables.measurements(spark, Sf))
        .filter(col("prev_ts_us").isNotNull && col("dt_us") > 0 &&
          col("dt_us") <= 21600L * 1000000L)
        .select(col("event_id"), col("dt_us")), "event_id")
      .filter(col("o") =!= col("dt_us"))
    assert(overlaps.count() == 0, "overlaps do not tile the interval")
  }

  test("typed Dataset[Measurement] view agrees with the untyped frame") {
    val ds = Tables.measurementsDs(spark, Sf)
    val m = Tables.measurements(spark, Sf)
    assert(ds.count() == m.count())
    val one = ds.filter(x => x.wrapped == x.counter % 1000000L).count()
    assert(one == ds.count(), "typed rows violate the wrap invariant")
  }

  test("rate of a monotone counter without wrap equals plain delta rate") {
    val m = Tables.measurements(spark, Sf)
    val r = TimeSeriesOps.withRate(spark, m)
      .filter(col("prev_wrapped").isNotNull && col("wrapped") >= col("prev_wrapped"))
      .withColumn("plain", col("wrapped") - col("prev_wrapped"))
    assert(r.filter(col("delta_cents") =!= col("plain")).count() == 0)
  }
}
