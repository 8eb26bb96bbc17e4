package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{StoreLayout, StoreManifest, TsdbStore}

/** A RawLocalFileSystem under the scheme `rec:` that (a) is NOT in
  * [[TsdbStore.AtomicRenameSchemes]] — it stands in for an object
  * store, like ObjectStoreGuardSpec's `torn:` — and (b) RECORDS every
  * rename, so the spec can prove the manifest protocol's core claim
  * mechanically: no rename ever touches a live (published) path; every
  * rename a manifest-store mutation performs stays inside private
  * `_segs/` staging, where non-atomic object-store rename is harmless.
  * Top-level class: Hadoop instantiates `fs.rec.impl` by reflection. */
class RecordingRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "rec"
  override def getUri: java.net.URI = java.net.URI.create("rec:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    RecordingRenameFileSystem.record(src.toString, dst.toString)
    super.rename(src, dst)
  }
}

object RecordingRenameFileSystem {
  val renames = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
  def record(src: String, dst: String): Unit = renames.add((src, dst))
}

/** The `commit = "manifest"` store layout (round 14 — VERDICT r13
  * missing #1's named upgrade path, option (b)): data in write-once
  * segments, live state = the newest `_commits/v<N>.mf` snapshot,
  * every mutation = ONE new-file create. This spec pins the contract
  * end-to-end on a filesystem the rename layout REFUSES:
  *
  *  1. every lifecycle op (ingest, fetch at all resolutions, quantile,
  *     bulk, listSeries, metadata as-of, incremental upsert, full
  *     upsert, compaction, series delete, retention) matches a
  *     rename-layout twin fed the same inputs, bit-for-bit;
  *  2. no mutation ever renames a live path (recorded mechanically);
  *  3. an uncommitted segment (= a crash before the manifest create)
  *     is invisible to readers and reclaimed by vacuum;
  *  4. each mutation commits exactly one snapshot; retention is a pure
  *     metadata commit whose files vacuum reclaims later;
  *  5. the single-writer contract is ENFORCED at the commit point
  *     (version-file create-exclusive), not just documented.
  */
class ManifestCommitSpec extends SparkSpec {

  private val ManifestLayout = StoreLayout(commit = "manifest")

  /** Register rec:// and return a store root on it. */
  private def recRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.rec.impl", classOf[RecordingRenameFileSystem].getName)
    s"rec:${Files.createTempDirectory("graft_manifest").toString}"
  }

  private def localRoot(): String =
    Files.createTempDirectory("graft_manifest_twin").toString

  private def events(): DataFrame = Tables.events(spark, Sf)

  /** A deterministic late-data replay: user 7's clicks over a few
    * days, values shifted — same event_ids and timestamps, so
    * partitions never move (the upsertIncremental precondition). */
  private def replay(): DataFrame =
    events().filter(col("user_id") === 7 && col("event_type") === "click" &&
        col("ts") >= lit("2024-01-09") && col("ts") < lit("2024-01-13"))
      .withColumn("value", col("value") + 1.0)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Both stores, mutated in lockstep through the whole lifecycle. */
  private lazy val stores: (String, String) = {
    val m = recRoot(); val r = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    TsdbStore.ingest(spark, events(), r, StoreLayout())
    val meta = events().filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("ver_id"),
        unix_micros(col("ts")).as("valid_from_us"),
        expr("CAST(round(value*100) AS BIGINT)").as("speed_cents"))
    TsdbStore.ingestMetadata(spark, meta, m)
    TsdbStore.ingestMetadata(spark, meta, r)
    (m, r)
  }

  private val B = 1704844800L // 2024-01-10
  private val E = 1705708800L // 2024-01-20

  test("ingest on an object-store scheme: no base dir, no live-path rename, one snapshot") {
    val (m, _) = stores
    val local = new java.io.File(m.stripPrefix("rec:"))
    assert(!new java.io.File(local, "base").exists(),
      "manifest ingest must not create a live base dir")
    assert(new java.io.File(local, "_commits").listFiles().count(
      _.getName.endsWith(".mf")) >= 1, "no snapshot committed")
    val under = RecordingRenameFileSystem.renames.toArray
      .collect { case (s: String, d: String) if d.contains(local.toString) => (s, d) }
    assert(under.nonEmpty, "expected job-commit renames inside segments")
    under.foreach { case (s, d) =>
      assert(d.contains("/_segs/"), s"rename escaped segment staging: $s -> $d")
      assert(s.contains("/_segs/"), s"rename sourced outside segments: $s -> $d")
    }
  }

  test("fetch parity: raw, consolidated, quantile, bulk, listSeries, metadata as-of") {
    val (m, r) = stores
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E)))
    assert(rows(TsdbStore.fetch(spark, m, 3L, "view", B, E, 21600L, "max")) ==
      rows(TsdbStore.fetch(spark, r, 3L, "view", B, E, 21600L, "max")))
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E, 86400L, "rate")) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E, 86400L, "rate")))
    assert(rows(TsdbStore.fetchQuantile(spark, m, 7L, "click", B, E, 86400L, 0.95)) ==
      rows(TsdbStore.fetchQuantile(spark, r, 7L, "click", B, E, 86400L, 0.95)))
    assert(rows(TsdbStore.fetchBulk(spark, m, Seq((7L, "click"), (3L, "view")), B, E, 21600L)) ==
      rows(TsdbStore.fetchBulk(spark, r, Seq((7L, "click"), (3L, "view")), B, E, 21600L)))
    assert(rows(TsdbStore.listSeries(spark, m)) == rows(TsdbStore.listSeries(spark, r)))
    assert(rows(TsdbStore.fetchMetaAsof(spark, m, "purchase", B, E)) ==
      rows(TsdbStore.fetchMetaAsof(spark, r, "purchase", B, E)))
  }

  test("incremental upsert: lockstep parity, ONE atomic multi-table commit") {
    val (m, r) = stores
    val before = manifestCount(m)
    val touchedM = TsdbStore.upsertIncremental(spark, replay(), m)
    val touchedR = TsdbStore.upsertIncremental(spark, replay(), r)
    assert(touchedM == touchedR && touchedM.nonEmpty)
    assert(manifestCount(m) == before + 1,
      "base + 6 cascade tables must land as exactly one snapshot")
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E)))
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E, 21600L, "average")) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E, 21600L, "average")))
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E, 86400L, "delta")) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E, 86400L, "delta")))
    assert(rows(TsdbStore.fetchQuantile(spark, m, 7L, "click", B, E, 86400L, 0.5)) ==
      rows(TsdbStore.fetchQuantile(spark, r, 7L, "click", B, E, 86400L, 0.5)))
    // an EMPTY batch must not commit a junk identical snapshot
    val count = manifestCount(m)
    TsdbStore.upsertIncremental(spark, replay().filter(lit(false)), m)
    assert(manifestCount(m) == count, "empty upsert published a snapshot")
  }

  test("compaction: same rows, fewer live files, old files wait for vacuum") {
    val (m, r) = stores
    val dt = "2024-01-10"
    val preM = rows(TsdbStore.fetch(spark, m, 7L, "click", B, B + 86400L))
    TsdbStore.compactPartition(spark, m, dt)
    TsdbStore.compactPartition(spark, r, dt)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, B + 86400L)) == preM)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E)))
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = StoreManifest.load(fs, m).entries(("base", dt))
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$m/$live"))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    assert(files == 1, s"compacted partition should serve 1 file, got $files")
  }

  test("deleteSeries + dropBefore parity; retention is metadata-only until vacuum") {
    val (m, r) = stores
    assert(TsdbStore.deleteSeries(spark, m, 5L, "view") ==
      TsdbStore.deleteSeries(spark, r, 5L, "view"))
    assert(rows(TsdbStore.fetchBulk(spark, m, Seq((5L, "view"), (5L, "click")), B, E, 21600L)) ==
      rows(TsdbStore.fetchBulk(spark, r, Seq((5L, "view"), (5L, "click")), B, E, 21600L)))
    val cutoff = 1704672000L // 2024-01-08
    val dm = TsdbStore.dropBefore(spark, m, cutoff)
    val dr = TsdbStore.dropBefore(spark, r, cutoff)
    assert(dm == dr && dm("base").nonEmpty)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", 1704067200L, E)) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", 1704067200L, E)))
    // the dropped partitions' FILES are still on disk (pure metadata
    // drop; in-flight readers unharmed) until vacuum reclaims them
    val local = new java.io.File(m.stripPrefix("rec:"))
    def segBytes(): Long = Files.walk(new java.io.File(local, "_segs").toPath)
      .filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    val before = segBytes()
    val preFetch = rows(TsdbStore.fetch(spark, m, 7L, "click", 1704067200L, E))
    val (deadSegs, deadVers) = TsdbStore.vacuum(spark, m, keepManifests = 1)
    assert(deadSegs.nonEmpty && deadVers.nonEmpty,
      "lifecycle garbage should exist by this point")
    assert(segBytes() < before, "vacuum should reclaim bytes")
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", 1704067200L, E)) == preFetch,
      "vacuum must not disturb the live snapshot")
  }

  test("an uncommitted segment (crash before commit) is invisible and vacuumable") {
    val (m, _) = stores
    val pre = rows(TsdbStore.fetch(spark, m, 7L, "click", 1704067200L, E))
    // simulate a mutation that died after staging, before its commit
    val seg = StoreManifest.newSegId()
    events().limit(50).select("user_id", "event_type", "event_id", "ts", "value")
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt")
      .parquet(StoreManifest.segTableDir(m, seg, "base"))
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", 1704067200L, E)) == pre,
      "orphan segment leaked into reads")
    val (deadDirs, _) = TsdbStore.vacuum(spark, m, keepManifests = 1)
    assert(deadDirs.exists(_.contains(seg)), "vacuum missed the orphan segment")
    assert(!new java.io.File(m.stripPrefix("rec:"), s"_segs/$seg").exists())
  }

  test("a CONCURRENT reader sees whole-old or whole-new, never a blend") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    // old and new states of the touched series, as row sets
    def read(): Seq[String] = rows(
      TsdbStore.fetch(spark, m, 7L, "click", 1704067200L, 1706659200L))
    val before = read()
    val mutation = Future(TsdbStore.upsertIncremental(spark, replay(), m))
    // hammer reads for the mutation's whole duration: the multi-table
    // update (base + 6 cascade tables) must be invisible until its
    // single snapshot create, so every observed row set must equal
    // EXACTLY the old or the new state — a torn base (partition mix)
    // or a half-published table set would produce a third row set
    var observed = Set.empty[Seq[String]]
    var n = 0
    while (!mutation.isCompleted) { observed += read(); n += 1 }
    Await.result(mutation, 5.minutes)
    val after = read()
    assert(after != before, "replay should change the fetched rows")
    assert(n >= 3, s"only $n concurrent reads landed — mutation too fast to exercise")
    val stray = observed -- Set(before, after)
    assert(stray.isEmpty,
      s"a concurrent reader observed ${stray.size} state(s) that are " +
        "neither whole-old nor whole-new")
  }

  test("time travel: a retained snapshot reads exactly as it committed, until vacuumed") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val v1 = TsdbStore.snapshotVersions(spark, m).last
    val before = rows(TsdbStore.readTableAt(spark, m, "base", v1)
      .filter(col("user_id") === 5 && col("event_type") === "view"))
    assert(before.nonEmpty)
    TsdbStore.deleteSeries(spark, m, 5L, "view")
    val v2 = TsdbStore.snapshotVersions(spark, m).last
    assert(v2 == v1 + 1)
    // the live snapshot lost the series; the old one still serves it
    assert(rows(TsdbStore.readTableAt(spark, m, "base", v2)
      .filter(col("user_id") === 5 && col("event_type") === "view")).isEmpty)
    assert(rows(TsdbStore.readTableAt(spark, m, "base", v1)
      .filter(col("user_id") === 5 && col("event_type") === "view")) == before)
    // trimming history makes the old read fail LOUDLY, naming what's left
    TsdbStore.vacuum(spark, m, keepManifests = 1)
    val e = intercept[IllegalArgumentException] {
      TsdbStore.readTableAt(spark, m, "base", v1).collect()
    }
    assert(e.getMessage.contains("retained"), e.getMessage)
    // ...and the live snapshot is undisturbed by the trim
    assert(rows(TsdbStore.readTableAt(spark, m, "base", v2)
      .filter(col("user_id") === 5)).nonEmpty)
  }

  test("a torn (crashed-mid-publish) manifest is not-committed-yet, and the next publish clears it") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = StoreManifest.load(fs, m)
    val pre = rows(TsdbStore.fetch(spark, m, 7L, "click", B, E))
    // simulate a writer that died mid-publish: a PREFIX of the next
    // version file — header + one entry, NO terminator (on POSIX a
    // concurrent reader can also observe exactly this during a live
    // commit; both must read as "commit not yet happened")
    val torn = new org.apache.hadoop.fs.Path(
      s"$m/_commits/v${"%019d".format(live.version + 1)}.mf")
    val out = fs.create(torn, false)
    out.write("graft-manifest v1\nbase\t2024-01-09\t_segs/dead/base/dt=2024-01-09\n"
      .getBytes("UTF-8"))
    out.close()
    // readers serve the previous (complete) snapshot
    assert(StoreManifest.load(fs, m).version == live.version)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) == pre)
    // pinning the exact read a prefix would otherwise corrupt: the
    // torn version is loudly incomplete, not a silently short table
    val e = intercept[IllegalStateException] {
      StoreManifest.loadAt(fs, m, live.version + 1)
    }
    assert(e.getMessage.contains("incomplete"), e.getMessage)
    // the next mutation takes the slot the dead writer left torn
    TsdbStore.upsertIncremental(spark, replay(), m)
    assert(StoreManifest.load(fs, m).version == live.version + 1)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) != pre)
  }

  test("single-writer violation fails loudly at the commit point") {
    val (m, _) = stores
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, m)
    // a racing writer takes the next version first
    StoreManifest.publish(fs, m, snap.version, snap.entries)
    val e = intercept[IllegalStateException] {
      StoreManifest.publish(fs, m, snap.version, snap.entries)
    }
    assert(e.getMessage.contains("commit conflict"), e.getMessage)
  }

  test("bucketed layout refuses the manifest protocol at construction") {
    val e = intercept[IllegalArgumentException] {
      StoreLayout(buckets = 8, commit = "manifest")
    }
    assert(e.getMessage.contains("rename"), e.getMessage)
  }

  private def manifestCount(store: String): Int =
    new java.io.File(new java.io.File(store.stripPrefix("rec:")), "_commits")
      .listFiles().count(_.getName.endsWith(".mf"))
}
