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

  test("rate of a monotone counter without wrap equals plain delta rate") {
    val m = Tables.measurements(spark, Sf)
    val r = TimeSeriesOps.withRate(spark, m)
      .filter(col("prev_wrapped").isNotNull && col("wrapped") >= col("prev_wrapped"))
      .withColumn("plain", col("wrapped") - col("prev_wrapped"))
    assert(r.filter(col("delta_cents") =!= col("plain")).count() == 0)
  }
}
