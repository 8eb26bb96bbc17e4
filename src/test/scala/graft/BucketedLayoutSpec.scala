package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Proves the scale claim in Tables/TimeSeriesOps scaladoc: with a
  * series-bucketed layout, per-series window ops (the engine's hot
  * path: lag/rate/heartbeat) need NO shuffle — the bucketed scan
  * already satisfies the window's clustering requirement. On 100 TB
  * that's the difference between a full-data exchange per query and
  * none. */
class BucketedLayoutSpec extends SparkSpec {

  test("per-series window over a bucketed table plans zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS m_bucketed")
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse directory survives — clear the location too
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "m_bucketed")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    Tables.measurements(spark, Sf)
      .select("user_id", "event_type", "event_id", "ts_us", "cents", "wrapped")
      .write.bucketBy(8, "user_id", "event_type")
      .sortBy("user_id", "event_type", "ts_us")
      .saveAsTable("m_bucketed")

    val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    val rated = spark.table("m_bucketed")
      .withColumn("prev", lag("wrapped", 1).over(w))
      .withColumn("dt_us", col("ts_us") - lag("ts_us", 1).over(w))
    val plan = rated.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed layout did not remove the window shuffle:\n${plan.take(2000)}")
    // sanity: same row count and same lag values as the unbucketed path
    val unbucketed = graft.operators.TimeSeriesOps
      .withRate(spark, Tables.measurements(spark, Sf))
      .select("event_id", "prev_wrapped", "dt_us")
    val got = rated.select(col("event_id"), col("prev").as("prev_wrapped"), col("dt_us"))
    assert(got.count() == unbucketed.count())
    assert(got.exceptAll(unbucketed).isEmpty, "bucketed path changed results")
  }
}
