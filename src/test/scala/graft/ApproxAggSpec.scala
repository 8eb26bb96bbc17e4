package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct must stay within its rsd bound of the exact
  * count (oracle-exempt — HLL sketches differ across engines). */
class ApproxAggSpec extends SparkSpec {

  test("approx_percentile within rank-error bound of exact percentile") {
    val li = Tables.lineitem(spark, Sf)
    val rows = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"),
        count(lit(1)).as("n"))
      .collect()
    rows.foreach { r =>
      val (approx, exact) = (r.getDouble(1), r.getDouble(2))
      // accuracy 1000 ⇒ rank error ≤ n/1000; translate loosely to value
      // space by requiring the estimate within 5% of the exact median
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

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
