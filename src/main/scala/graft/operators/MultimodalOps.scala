package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 J): media as opaque
  * `binary` payloads + typed metadata, with decode / feature-extract /
  * resize / frame-sample as per-partition batch transforms.
  *
  * The decode step is a STUB — this container ships no image/audio
  * codecs — but deliberately a *deterministic* one (dimensions and
  * features derived from the payload bytes), so the surrounding
  * plumbing is fully testable: schemas, encoders, partition-preserving
  * `mapPartitions` batch shape, and downstream joins all run exactly
  * as they would with a real codec behind the same signature.
  *
  * Scale notes: payloads travel as parquet binary; decode is a NARROW
  * per-partition pass (no shuffle), the shape that lets 1000 executors
  * decode 100 TB embarrassingly parallel. Metadata-only predicates
  * (kind, width) are plain columns, so Catalyst prunes/pushes them
  * without touching payload bytes.
  */
object MultimodalOps {

  /** One media asset: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata + a small feature vector per asset. */
  case class DecodedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Long, checksum: Long, features: Array[Double])

  /** Wrap any table with a binary payload column (here: utf-8 bytes of
    * a text column — the fixture has no real media; the schema is the
    * contract). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        (when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio")
          .otherwise("video")).as("kind"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would call the codec here
    * (same signature, same batch-iterator shape); the stub derives
    * deterministic pseudo-dimensions and an 8-dim byte-histogram
    * feature from the payload. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload
        var sum = 0L
        val hist = new Array[Double](8)
        var i = 0
        while (i < bytes.length) {
          sum = (sum * 131 + (bytes(i) & 0xFF)) % 1000000007L
          hist((bytes(i) & 0xFF) % 8) += 1.0
          i += 1
        }
        val w = 64 + (sum % 1024).toInt
        val h = 64 + ((sum / 1024) % 1024).toInt
        DecodedMedia(m.media_id, m.kind, w, h, bytes.length.toLong, sum,
          hist.map(x => if (bytes.length == 0) 0.0 else x / bytes.length))
      }
    }
  }

  /** Metadata-space resize: scale stored dims to fit a bounding box —
    * pure column math over decoded metadata, no payload access. */
  def resizePlan(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan for video rows: one row per sampled frame
    * index (generator expression — no UDF, no shuffle). */
  def frameSamplePlan(decoded: DataFrame, everyN: Int, assumedFrames: Int): DataFrame =
    decoded.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(assumedFrames - 1), lit(everyN))))

  /** End-to-end demo pipeline over the documents fixture. */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val decoded = decode(asMedia(docs, "doc_id", "text")).toDF()
    resizePlan(decoded, 256)
      .select("media_id", "kind", "width", "height", "out_width", "out_height",
        "n_bytes", "checksum")
  }
}
