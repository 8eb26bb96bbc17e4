package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitionPath, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Manifest-snapshot → single-relation bridge. A graft manifest store
  * resolves a table to an explicit (dt → immutable segment directory)
  * map; Hive-style partition DISCOVERY cannot express that (the
  * directories live under different `_segs/<segId>` parents, which
  * trips CONFLICTING_DIRECTORY_STRUCTURES), and a per-segment union of
  * separate reads fragments the scan into several relations — breaking
  * whole-stage codegen spans, duplicating file-listing work, and
  * hiding the store from plan-level rewrites
  * (graft.plans.RollupSubstitution matches ONE base relation).
  *
  * This shim does what Spark's own catalog does for partitioned
  * tables: build the `PartitionSpec` EXPLICITLY (the manifest IS the
  * partition catalog) and hand it to `InMemoryFileIndex` as the
  * user-specified spec, so the planner sees one ordinary
  * parquet `HadoopFsRelation` — partition pruning, filter pushdown,
  * and codegen all behave exactly as for a directory-discovered table.
  * Lives in the sql package namespace for the `private[sql]`
  * constructors (`FileStatusCache`, `Dataset.ofRows`) — the standard
  * extension-library pattern; no Spark internals modified or copied. */
object PartitionedRelationBridge {

  /** One parquet relation over explicitly-cataloged partitions.
    *
    * @param partitionSchema the partition columns (graft: a single
    *   `dt` DATE or STRING column)
    * @param parts (partition values, partition directory) — every
    *   directory is listed eagerly, exactly once, at construction
    * @param dataSchema the file schema (partition columns excluded) */
  def dataFrame(spark: SparkSession, partitionSchema: StructType,
                parts: Seq[(InternalRow, Path)],
                dataSchema: StructType): DataFrame =
    dataFrameWithFiles(spark, partitionSchema,
      parts.map { case (v, d) => (v, d, None) }, dataSchema)

  /** [[dataFrame]] with OPTIONAL explicit per-partition file lists
    * (round 16 — the manifest's per-file statistics skip): a partition
    * given `Some(files)` contributes exactly those files as the
    * index's root paths — no directory listing happens for it at all,
    * and files the caller's stats provably excluded are never even
    * seen by the planner; `None` keeps the eager directory listing.
    * The `PartitionSpec` still maps partition values to DIRECTORIES —
    * the index attributes each listed leaf file to its parent, which
    * is the qualified partition dir either way, so dt pruning, filter
    * pushdown, and codegen behave identically in both modes (this is
    * the same file-roots construction `spark.read.parquet(file, ...)`
    * uses). */
  def dataFrameWithFiles(spark: SparkSession, partitionSchema: StructType,
                         parts: Seq[(InternalRow, Path, Option[Seq[Path]])],
                         dataSchema: StructType): DataFrame = {
    val classic = spark.asInstanceOf[ClassicSparkSession]
    // fully QUALIFY the partition directories and files (scheme +
    // authority): the index keys its listed leaves by qualified path,
    // so an unqualified spec path would match zero files — silently
    val hadoopConf = classic.sessionState.newHadoopConf()
    val qualified = parts.map { case (values, dir, files) =>
      val fs = dir.getFileSystem(hadoopConf)
      (values, fs.makeQualified(dir), files.map(_.map(fs.makeQualified)))
    }
    val spec = PartitionSpec(partitionSchema,
      qualified.map { case (values, dir, _) => PartitionPath(values, dir) })
    val roots = qualified.flatMap { case (_, dir, files) =>
      files.getOrElse(Seq(dir))
    }
    val index = new InMemoryFileIndex(classic, roots,
      Map.empty, None, FileStatusCache.getOrCreate(classic), Some(spec), None)
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      None, new ParquetFileFormat, Map.empty)(classic)
    ClassicDataset.ofRows(classic, LogicalRelation(relation))
  }
}
