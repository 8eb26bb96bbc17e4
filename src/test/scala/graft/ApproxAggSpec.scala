package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct must stay within its rsd bound of the exact
  * count (oracle-exempt — HLL sketches differ across engines). */
class ApproxAggSpec extends SparkSpec {

  test("HLL estimate within rsd of exact distinct") {
    val ev = Tables.events(spark, Sf)
    val rows = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
