package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** The storage layer: the reference's directory-tree TSDB re-expressed
  * as a partitioned parquet layout plus materialized multi-resolution
  * aggregates.
  *
  * Reference mapping (SURVEY.md §1.2, [pub: tsdb/__init__.py,
  * chunk_mapper.py — unverified, mount empty, SURVEY.md §0]):
  *  - date-named chunk files            → `dt=YYYY-MM-DD` partitions
  *    (partition pruning replaces chunk-name arithmetic)
  *  - offset addressing within a chunk  → parquet row-group min/max
  *    pushdown on `ts_us`
  *  - per-insert Aggregator.update cascade → batch-materialized
  *    `agg_<step>` tables, coarser levels computed FROM finer ones
  *  - TSDBVar path lookup               → series-key equality predicates
  *
  * Scale notes: ingest is one narrow pass + `partitionBy("dt")` write
  * (at 100 TB: daily partitions × size-targeted files; add bucketing
  * by series key so per-series windows and idempotent upserts are
  * shuffle-free). Reads prune partitions first, then row groups, then
  * columns — the same three-level pruning story as the reference's
  * chunk/offset/field addressing.
  */
object TsdbStore {

  val AggSteps: Seq[Long] = Seq(21600L, 86400L) // 6 h, 1 d cascade

  /** events-shaped feed → the store's row shape, with the dt partition
    * key derived from the timestamp. */
  private def normalize(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        expr("CAST(round(value*100) AS BIGINT)").as("cents"))
      .withColumn("dt", to_date(timestamp_micros(col("ts_us"))))

  /** Batch ingest: normalize an events-shaped feed into the base
    * measurements table (partitioned by dt) + the aggregate cascade. */
  def ingest(spark: SparkSession, events: DataFrame, path: String): Unit = {
    val m = normalize(events)
    // cluster rows by (series, ts) inside each date partition: parquet
    // row-group min/max then prunes BOTH the series filter and the
    // time range within a day — the offset-addressing story at file level
    m.sortWithinPartitions("dt", "user_id", "event_type", "ts_us")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("dt").parquet(s"$path/base")

    // aggregate cascade: 6 h from base, 1 d from 6 h (never re-scan raw)
    val base = spark.read.parquet(s"$path/base")
    var finer = TimeSeriesOps.downsample(base, AggSteps.head)
      .withColumn("dt", to_date(timestamp_micros(col("slot_ts") * 1000000L)))
    finer.write.mode(SaveMode.Overwrite).partitionBy("dt")
      .parquet(s"$path/agg_${AggSteps.head}")
    AggSteps.sliding(2).foreach {
      case Seq(fine, coarse) =>
        val f = spark.read.parquet(s"$path/agg_$fine")
        f.groupBy(col("user_id"), col("event_type"),
            (expr(s"slot_ts div $coarse") * coarse).as("slot_ts"))
          .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"),
            min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))
          .withColumn("dt", to_date(timestamp_micros(col("slot_ts") * 1000000L)))
          .write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(s"$path/agg_$coarse")
      case _ => ()
    }
  }

  /** Idempotent re-ingest of late/replayed rows: last write per
    * (series, event_id) wins — offset-addressing upsert semantics as a
    * dedup-by-key pass over the union of old + new. */
  def upsert(spark: SparkSession, newEvents: DataFrame, path: String): Unit = {
    val existing = spark.read.parquet(s"$path/base")
      .select("user_id", "event_type", "event_id", "ts_us", "cents", "dt")
    val incoming = normalize(newEvents)
    val merged = existing.withColumn("gen", lit(0))
      .unionByName(incoming.withColumn("gen", lit(1)))
      .groupBy("user_id", "event_type", "event_id")
      .agg(max_by(struct(col("ts_us"), col("cents"), col("dt")), col("gen")).as("r"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("r.ts_us"), col("r.cents"), col("r.dt"))
    // write-then-swap; a production store would use a table format with
    // atomic commit (the layout and dedup semantics are the point here)
    merged.write.mode(SaveMode.Overwrite).partitionBy("dt").parquet(s"$path/base_new")
  }

  /** Incremental upsert — the cascade's UPDATE CONTRACT: merge
    * late/replayed rows into ONLY the dt partitions they touch, then
    * recompute just those partitions of the 6h/1d cascade. Both
    * aggregate steps divide a day, so a base day maps to exactly one
    * partition at every level and the blast radius of a late row is
    * (levels × one partition). This is the Spark-native answer to the
    * reference's per-insert Aggregator.update [pub: esxsnmp/persist.py
    * TSDBPollPersister — unverified, SURVEY.md §0]: at 100 TB,
    * recompute-touched-partitions rewrites a few files where a full
    * cascade rebuild would re-scan the table.
    *
    * Precondition (slot-addressing semantics): a replayed event_id
    * keeps its original day — rows are addressed by (series, event_id,
    * day). A replay that moves days must use the full [[upsert]].
    * Returns the touched dt strings (TsdbStoreSpec asserts at file
    * level that nothing else was rewritten and the result equals a
    * full recompute). */
  def upsertIncremental(spark: SparkSession, newEvents: DataFrame,
                        path: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val incoming = normalize(newEvents)
    val touched = incoming.select(col("dt").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val touchedDates = touched.map(java.sql.Date.valueOf)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // write df (touched dts only) to a staging dir, then rename each
    // staged dt directory over the live one — the same swap as
    // [[compactPartition]], one partition at a time
    def swapIn(table: String, df: DataFrame): Unit = {
      val staged = s"$path/${table}_inc"
      df.write.mode(SaveMode.Overwrite).option("compression", "zstd")
        .partitionBy("dt").parquet(staged)
      touched.foreach { dt =>
        swapPartitionDir(fs, new Path(s"$staged/dt=$dt"),
          new Path(s"$path/$table/dt=$dt"), new Path(s"$path/${table}_retired/dt=$dt"))
      }
      fs.delete(new Path(staged), true)
      fs.delete(new Path(s"$path/${table}_retired"), true)
    }

    // base: last write wins within the touched partitions only
    // (bootstrap: no base yet ⇒ empty existing side — this makes the
    // incremental path usable as the streaming ingest sink too)
    val existing =
      if (fs.exists(new Path(s"$path/base")))
        spark.read.parquet(s"$path/base")
          .filter(col("dt").isin(touchedDates: _*)) // partition pruning
          .select("user_id", "event_type", "event_id", "ts_us", "cents", "dt")
      else incoming.filter(lit(false))
    val merged = existing.withColumn("gen", lit(0))
      .unionByName(incoming.withColumn("gen", lit(1)))
      .groupBy("user_id", "event_type", "event_id")
      .agg(max_by(struct(col("ts_us"), col("cents"), col("dt")), col("gen")).as("r"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("r.ts_us").as("ts_us"), col("r.cents").as("cents"), col("r.dt").as("dt"))
    swapIn("base", merged)

    // cascade: coarse from fine, touched partitions only
    val newBase = spark.read.parquet(s"$path/base")
      .filter(col("dt").isin(touchedDates: _*))
    swapIn(s"agg_${AggSteps.head}",
      TimeSeriesOps.downsample(newBase, AggSteps.head)
        .withColumn("dt", to_date(timestamp_micros(col("slot_ts") * 1000000L))))
    AggSteps.sliding(2).foreach {
      case Seq(fine, coarse) =>
        val f = spark.read.parquet(s"$path/agg_$fine")
          .filter(col("dt").isin(touchedDates: _*))
        swapIn(s"agg_$coarse",
          f.groupBy(col("user_id"), col("event_type"),
              (expr(s"slot_ts div $coarse") * coarse).as("slot_ts"))
            .agg(sum("n").as("n"), sum("sum_cents").as("sum_cents"),
              min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))
            .withColumn("dt", to_date(timestamp_micros(col("slot_ts") * 1000000L))))
      case _ => ()
    }
    touched
  }

  /** Small-file compaction for one dt partition: streaming ingest
    * lands a file per microbatch per task, and a year of 10-second
    * polls would leave the base table as millions of KB-sized files —
    * the #1 operational decay mode of any file-backed store. Rewrites
    * the partition into `targetFiles` zstd files re-clustered by
    * (series, ts) so row-group min/max pruning is restored, then
    * write-then-swap like [[upsert]]. Row set is untouched
    * (TsdbStoreSpec proves bag equality + file-count drop). */
  def compactPartition(spark: SparkSession, path: String, dt: String,
                       targetFiles: Int = 1): Unit = {
    val staged = s"$path/base_compacted/dt=$dt"
    // fail fast on a typo'd / already-dropped partition — compacting
    // an empty read would otherwise install an empty junk partition
    require(new org.apache.hadoop.fs.Path(s"$path/base/dt=$dt")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(s"$path/base/dt=$dt")),
      s"compactPartition: no such partition dt=$dt under $path/base")
    spark.read.parquet(s"$path/base")
      .filter(col("dt") === lit(dt))
      .drop("dt") // encoded by the target directory name (hive layout)
      // range-repartition so multi-file targets stay globally clustered
      // on (series, ts) — plain round-robin would only cluster within
      // each file and row-group pruning across files would be lost
      .repartitionByRange(targetFiles, col("user_id"), col("event_type"), col("ts_us"))
      .sortWithinPartitions("user_id", "event_type", "ts_us")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .parquet(staged)
    // swap the staged directory into the live partition path so readers
    // of base actually see the compaction (a production deployment
    // would sit this behind a table format's atomic commit)
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    swapPartitionDir(fs, new Path(staged),
      new Path(s"$path/base/dt=$dt"), new Path(s"$path/base_retired/dt=$dt"))
    fs.delete(new Path(s"$path/base_compacted"), true)
    fs.delete(new Path(s"$path/base_retired"), true)
  }

  /** The store's one atomicity-critical sequence, shared by compaction
    * and incremental upsert: retire the live partition dir (if any —
    * absent on a bootstrap install), rename the staged dir into its
    * place, drop the retired copy. The staged dir is REQUIRED up
    * front, before anything is retired — the failure mode to make
    * impossible is retiring live data with no replacement to install.
    * Strict-rename safe: both parents are created first (HDFS/S3A
    * rename fails, rather than creating parents, when the destination
    * parent is missing — the local filesystem masks this). */
  private def swapPartitionDir(fs: org.apache.hadoop.fs.FileSystem,
                               staged: org.apache.hadoop.fs.Path,
                               live: org.apache.hadoop.fs.Path,
                               retired: org.apache.hadoop.fs.Path): Unit = {
    require(fs.exists(staged), s"swap: staged dir missing: $staged")
    fs.mkdirs(retired.getParent)
    fs.mkdirs(live.getParent)
    fs.delete(retired, true)
    if (fs.exists(live))
      require(fs.rename(live, retired), s"swap: could not retire $live")
    require(fs.rename(staged, live), s"swap: could not install $staged")
    fs.delete(retired, true)
  }

  /** Retention: drop every base + cascade partition strictly older
    * than `cutoffSec` — the reference's chunk-file deletion policy
    * [pub: RRD-style retention — unverified, SURVEY.md §0] as pure
    * directory removal. O(partitions dropped), touches no data files'
    * contents, and needs no recompute: cascade partitions are
    * day-scoped, so dropping a base day and its aggregate days leaves
    * every surviving partition internally consistent. Returns the
    * dropped dt strings per table. */
  def dropBefore(spark: SparkSession, path: String,
                 cutoffSec: Long): Map[String, Seq[String]] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // cutoff date via the SAME to_date(timestamp_micros(...)) the
    // ingest path used to derive dt — session-timezone-consistent, so
    // a non-UTC session can never delete data at/after the cutoff
    val cutoff = java.time.LocalDate.parse(
      spark.range(1).select(
        to_date(timestamp_micros(lit(cutoffSec * 1000000L))).cast("string"))
        .head().getString(0))
    val tables = "base" +: AggSteps.map(s => s"agg_$s")
    tables.map { t =>
      val dir = new Path(s"$path/$t")
      val dropped =
        if (!fs.exists(dir)) Seq.empty[String]
        else fs.listStatus(dir).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("dt="))
          .map(_.stripPrefix("dt="))
          // skip non-date dirs (e.g. __HIVE_DEFAULT_PARTITION__) rather
          // than aborting retention mid-table
          .filter(dt => scala.util.Try(java.time.LocalDate.parse(dt))
            .toOption.exists(_.isBefore(cutoff)))
          .sorted
      dropped.foreach { dt =>
        require(fs.delete(new Path(s"$path/$t/dt=$dt"), true),
          s"dropBefore: could not delete $t/dt=$dt")
      }
      t -> dropped
    }.toMap
  }

  /** Interchange sink/source: newline-delimited JSON export of any
    * result (the reference's API spoke JSON; bulk exports at scale
    * stay partitioned — one file per task, gzip). Read back with
    * [[readJson]] — schema round-trips through Spark's JSON reader. */
  def exportJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** CSV interchange twin of [[exportJson]] — header + explicit schema
    * on read (CSV carries no types; inference at 100 TB is both slow
    * and wrong). Partitioned one file per task like every bulk export. */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("compression", "gzip").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Directory-level prune on the dt partition key for a half-open
    * [beginSec, endSec) range — shared by every read path so a future
    * change (timezone, overflow guard) lands once. */
  private def dtPrune(beginSec: Long, endSec: Long): org.apache.spark.sql.Column =
    col("dt") >= to_date(timestamp_micros(lit(beginSec * 1000000L))) &&
      col("dt") <= to_date(timestamp_micros(lit(endSec * 1000000L)))

  /** The flagship read path — GET /snmp/<path>?begin=&end=&agg=&cf=
    * [pub: esxsnmp/newdb.py — unverified]: series filter + half-open
    * time range + consolidation function over the right resolution.
    * `agg=0` reads base samples; otherwise the materialized cascade.
    * cf ∈ {average, min, max, delta-ish sum, raw count}. */
  def fetch(spark: SparkSession, path: String,
            userId: Long, eventType: String,
            beginSec: Long, endSec: Long,
            aggStep: Long = 0L, cf: String = "average"): DataFrame = {
    require(aggStep == 0L || AggSteps.contains(aggStep), s"no such aggregate: $aggStep")
    if (aggStep == 0L) {
      spark.read.parquet(s"$path/base")
        .filter(dtPrune(beginSec, endSec)) // partition prune
        .filter(col("user_id") === userId && col("event_type") === eventType)
        .filter(col("ts_us") >= beginSec * 1000000L && col("ts_us") < endSec * 1000000L)
        .select(col("ts_us"), (col("cents").cast("double") / 100.0).as("value"))
        .orderBy("ts_us")
    } else {
      val cfCol = cf match {
        case "average" => col("sum_cents").cast("double") / 100.0 / col("n").cast("double")
        case "min"     => col("min_cents").cast("double") / 100.0
        case "max"     => col("max_cents").cast("double") / 100.0
        case "sum"     => col("sum_cents").cast("double") / 100.0
        case "raw"     => col("n").cast("double")
        case other     => throw new IllegalArgumentException(s"unknown cf: $other")
      }
      spark.read.parquet(s"$path/agg_$aggStep")
        .filter(dtPrune(beginSec, endSec))
        .filter(col("user_id") === userId && col("event_type") === eventType)
        .filter(col("slot_ts") >= beginSec && col("slot_ts") < endSec)
        .select(col("slot_ts"), cfCol.as("value"))
        .orderBy("slot_ts")
    }
  }

  /** Bulk fetch (POST /bulk): many series in one plan — a single
    * pruned scan with an IN-list of series keys, not a per-series
    * loop (the reference iterated; Spark shouldn't). */
  def fetchBulk(spark: SparkSession, path: String,
                series: Seq[(Long, String)],
                beginSec: Long, endSec: Long, aggStep: Long): DataFrame = {
    require(AggSteps.contains(aggStep), s"no such aggregate: $aggStep")
    val keys = series.map { case (u, e) => struct(lit(u), lit(e)) }
    spark.read.parquet(s"$path/agg_$aggStep")
      .filter(dtPrune(beginSec, endSec)) // partition prune
      .filter(struct(col("user_id"), col("event_type")).isin(keys: _*))
      .filter(col("slot_ts") >= beginSec && col("slot_ts") < endSec)
      .select(col("user_id"), col("event_type"), col("slot_ts"),
        (col("sum_cents").cast("double") / 100.0 / col("n").cast("double")).as("value"))
      .orderBy("user_id", "event_type", "slot_ts")
  }
}
