package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Multimodal plumbing: stub decode is deterministic, schema-stable,
  * partition-parallel; resize/frame-sample are metadata-only plans. */
class MultimodalSpec extends SparkSpec {

  test("stub decode: deterministic, schema-stable, no payload loss") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val media = MultimodalOps.asMedia(docs, "doc_id", "text")
    val once = MultimodalOps.decode(media).toDF()
    val twice = MultimodalOps.decode(media).toDF()
    assert(once.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "width", "height", "n_bytes", "checksum", "features"))
    assert(once.count() == docs.count())
    assert(once.exceptAll(twice).isEmpty, "decode not deterministic")
    // feature vector is a normalized 8-bin histogram
    val sums = once.select(aggregate(col("features"), lit(0.0), (a, x) => a + x).as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9 &&
      math.abs(sums.getDouble(1) - 1.0) < 1e-9)
  }

  test("resize plan bounds dimensions without touching payloads") {
    val out = MultimodalOps.pipeline(spark, Sf)
    assert(out.filter(col("out_width") > 256 || col("out_height") > 256).count() == 0)
    assert(out.filter(col("out_width") < 1 || col("out_height") < 1).count() == 0)
  }

  test("frame sampling emits every Nth frame for video rows only") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val decoded = MultimodalOps.decode(
      MultimodalOps.asMedia(docs, "doc_id", "text")).toDF()
    val frames = MultimodalOps.frameSamplePlan(decoded, everyN = 10, assumedFrames = 100)
    val kinds = frames.select("kind").distinct().collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("video"))
    val perVideo = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert(perVideo.length == 1 && perVideo.head.getLong(0) == 10)
  }
}
