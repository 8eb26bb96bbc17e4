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
    // WITHIN the torn grace the slot is NOT cleared: the file is
    // indistinguishable from an in-flight concurrent publish, and
    // deleting it under that writer would silently lose its commit
    // (ADVICE r14 #2) — the mutation fails loudly instead
    val guarded = intercept[IllegalStateException] {
      TsdbStore.upsertIncremental(spark, replay(), m)
    }
    assert(guarded.getMessage.contains("torn"), guarded.getMessage)
    assert(StoreManifest.load(fs, m).version == live.version,
      "refused publish must leave the live snapshot untouched")
    // PAST the grace the torn file is provably a crashed commit (no
    // sane publish holds a KB manifest open that long) and the next
    // mutation takes the slot the dead writer left torn
    spark.conf.set("spark.graft.manifest.tornGraceMs", "0")
    try {
      TsdbStore.upsertIncremental(spark, replay(), m)
      assert(StoreManifest.load(fs, m).version == live.version + 1)
      assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) != pre)
    } finally spark.conf.unset("spark.graft.manifest.tornGraceMs")
  }

  test("vacuum with a torn NEWEST manifest keeps the live store intact (ADVICE r14 #1)") {
    // the crashed-commit scenario the protocol exists to survive:
    // counting the torn file toward keepManifests=1 would retain ONLY
    // it, resolve an empty referenced set, and delete every live
    // segment plus the last complete manifest — total store loss
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = StoreManifest.load(fs, m)
    val pre = rows(TsdbStore.fetch(spark, m, 7L, "click", B, E))
    assert(pre.nonEmpty)
    val torn = new org.apache.hadoop.fs.Path(
      s"$m/_commits/v${"%019d".format(live.version + 1)}.mf")
    val out = fs.create(torn, false)
    out.write("graft-manifest v2\nbase\t2024-01-09\t_segs/dead/base/dt=2024-01-09\n"
      .getBytes("UTF-8"))
    out.close()
    // retention counts COMPLETE manifests only; the torn file itself
    // is deleted as crash garbage (grace 0 = "I am the sole writer")
    val (deletedDirs, deadVers) =
      StoreManifest.vacuum(fs, m, keepManifests = 1, tornGraceMs = 0L)
    assert(deletedDirs.isEmpty,
      s"vacuum deleted live data under a torn newest manifest: $deletedDirs")
    assert(deadVers == Seq(live.version + 1),
      s"the torn file should be the only reclaimed manifest: $deadVers")
    assert(StoreManifest.load(fs, m).version == live.version)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) == pre,
      "live reads must survive a vacuum that raced a crashed commit")
    // ...and WITHIN the grace even the torn file is left alone
    val out2 = fs.create(torn, false)
    out2.write("graft-manifest v2\n".getBytes("UTF-8")); out2.close()
    val (_, deadVers2) = StoreManifest.vacuum(fs, m, keepManifests = 1)
    assert(deadVers2.isEmpty,
      "a fresh torn file (possible in-flight publish) must survive vacuum")
  }

  test("snapshot properties and entry stats commit atomically and round-trip") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, m)
    // ingest harvested footer stats for every data entry
    val baseKeys = snap.entries.keys.filter(_._1 == "base")
    assert(baseKeys.nonEmpty)
    baseKeys.foreach { k =>
      val st = snap.stats.getOrElse(k,
        fail(s"no stats recorded for $k"))
      assert(st.rows.exists(_ > 0) && st.bytes.exists(_ > 0), s"$k: $st")
      val (lo, hi) = (st.tmin.get, st.tmax.get)
      assert(lo <= hi)
      // the recorded µs bounds sit inside the entry's own dt day
      val day = java.time.LocalDate.parse(k._2).toEpochDay
      assert(lo >= day * 86400000000L && hi < (day + 1) * 86400000000L,
        s"$k bounds [$lo,$hi] escape their dt partition")
    }
    // props survive an unrelated mutation's publish (carried forward)
    val v2 = StoreManifest.publish(fs, m, snap, snap.entries,
      snap.stats, snap.props + ("streamhwm:test" -> "41"))
    TsdbStore.compactPartition(spark, m,
      baseKeys.map(_._2).min)
    val after = StoreManifest.load(fs, m)
    assert(after.version > v2)
    assert(after.props.get("streamhwm:test").contains("41"),
      "snapshot props must be carried across maintenance commits")
    // the compacted partition's stats were re-harvested
    val ck = ("base", baseKeys.map(_._2).min)
    assert(after.stats.get(ck).exists(_.rows ==
      snap.stats(ck).rows), "compaction must preserve the row count stat")
  }

  test("entry stats prune partitions BEFORE the file index; v1 manifests still read (unpruned)") {
    // the Iceberg-style manifest skip (VERDICT r14 next #5): a ranged
    // fetch must hand the file index ONLY the partitions whose
    // recorded [tmin, tmax] can overlap the range — at 100 TB, listing
    // 2 directories instead of a year's worth
    def scanRoots(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, m)
    val liveBase = snap.entries.keys.count(_._1 == "base")
    assert(liveBase > 3, s"fixture too small to prove pruning: $liveBase")
    // two-day raw fetch: only the two overlapping dt dirs reach the index
    val narrow = TsdbStore.fetch(spark, m, 7L, "click", B, B + 2L * 86400L)
    val roots = scanRoots(narrow)
    assert(roots.size == 2 && roots.forall(_.contains("/base/dt=2024-01-1")),
      s"expected exactly the 2 in-range partitions listed, got: $roots")
    // a range past all data: zero directories listed, typed empty result
    val empty = TsdbStore.fetch(spark, m, 7L, "click",
      B + 400L * 86400L, B + 401L * 86400L)
    assert(scanRoots(empty).isEmpty && empty.count() == 0)
    // FORMAT COMPAT: a v1 manifest (3-field entries, no stats) still
    // loads — entries parse, stats read as unknown, so ranged reads
    // keep every partition instead of mis-skipping
    val v1Body = snap.entries.toSeq.sortBy(_._1)
      .map { case ((t, dt), rel) => s"$t\t$dt\t$rel" }
    val text = ("graft-manifest v1" +: v1Body :+ s"end ${v1Body.size}")
      .mkString("\n") + "\n"
    val f = new org.apache.hadoop.fs.Path(
      s"$m/_commits/v${"%019d".format(snap.version + 1)}.mf")
    val out = fs.create(f, false)
    out.write(text.getBytes("UTF-8")); out.close()
    val v1Snap = StoreManifest.load(fs, m)
    assert(v1Snap.version == snap.version + 1)
    assert(v1Snap.entries == snap.entries && v1Snap.stats.isEmpty)
    val unpruned = TsdbStore.fetch(spark, m, 7L, "click", B, B + 2L * 86400L)
    assert(scanRoots(unpruned).size == liveBase,
      "a stats-less manifest must keep every live partition")
    assert(rows(unpruned) == rows(narrow),
      "v1-resolved fetch must return the same rows")
  }

  test("vacuum-vs-reader contract: an overtaken in-flight reader fails LOUDLY, never reads silently short") {
    // the retention contract as a tested fact (VERDICT r14 next #6):
    // a reader holding a RESOLVED old snapshot (file index already
    // listed) whose files vacuum then reclaims must ERROR on execute —
    // Spark's default ignoreMissingFiles=false turns the deleted
    // files into a task failure, so the reader can never return a
    // silently partial table. Readers over still-retained snapshots
    // (the live one) are untouched: vacuum deletes only dirs no
    // retained manifest references.
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val v1 = TsdbStore.snapshotVersions(spark, m).last
    TsdbStore.deleteSeries(spark, m, 5L, "view") // v2: rewrites touched partitions
    // resolve BOTH readers before the vacuum (indexes listed now)
    val oldReader = TsdbStore.readTableAt(spark, m, "base", v1)
      .filter(col("user_id") === 5 && col("event_type") === "view")
    val liveReader = TsdbStore.readTable(spark, m,
      ManifestLayout, "base").filter(col("user_id") === 5)
    assert(oldReader.count() > 0, "pre-vacuum time-travel read must serve")
    val livePre = liveReader.count()
    val (deadDirs, deadVers) = TsdbStore.vacuum(spark, m, keepManifests = 1)
    assert(deadVers.contains(v1) && deadDirs.nonEmpty)
    // the overtaken reader: loud failure naming the missing file
    val e = intercept[org.apache.spark.SparkException] {
      oldReader.count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).contains("FileNotFound") ||
        String.valueOf(c.getMessage).contains("does not exist")),
      s"expected a missing-file failure, got: ${e.getMessage}")
    // re-resolving the trimmed version is equally loud, at metadata level
    val e2 = intercept[IllegalArgumentException] {
      TsdbStore.readTableAt(spark, m, "base", v1).collect()
    }
    assert(e2.getMessage.contains("retained"), e2.getMessage)
    // the live reader resolved BEFORE the vacuum still serves, whole
    assert(liveReader.count() == livePre,
      "vacuum disturbed a reader over the retained live snapshot")
  }

  test("history: each commit records its operation; vacuum trims history with the snapshots") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    TsdbStore.upsertIncremental(spark, replay(), m)
    TsdbStore.deleteSeries(spark, m, 5L, "view")
    val h = TsdbStore.history(spark, m).collect()
    assert(h.map(_.getAs[String]("op")).toSeq ==
      Seq("deleteSeries", "upsertIncremental", "ingest"),
      h.mkString("; ")) // newest first
    assert(h.map(_.getAs[Long]("version")).toSeq == h.map(_.getAs[Long]("version")).sorted.reverse.toSeq)
    h.foreach { r =>
      assert(r.getAs[java.lang.Long]("committed_ms") != null &&
        r.getAs[Int]("n_entries") > 0 && r.getAs[Int]("n_tables") >= 7 &&
        r.getAs[java.lang.Long]("live_bytes") > 0L, r.toString)
    }
    // provenance survives vacuum for retained snapshots; trimmed ones go
    TsdbStore.vacuum(spark, m, keepManifests = 2)
    val h2 = TsdbStore.history(spark, m).collect()
    assert(h2.map(_.getAs[String]("op")).toSeq ==
      Seq("deleteSeries", "upsertIncremental"))
  }

  test("single-writer violation fails loudly at the commit point") {
    val (m, _) = stores
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, m)
    // a racing writer takes the next version first
    StoreManifest.publish(fs, m, snap, snap.entries)
    val e = intercept[IllegalStateException] {
      StoreManifest.publish(fs, m, snap, snap.entries)
    }
    assert(e.getMessage.contains("commit conflict"), e.getMessage)
    // ...and the loser's typed conflict is the retryable subclass the
    // optimistic loop dispatches on
    assert(e.isInstanceOf[graft.sources.ManifestConflictException])
  }

  test("bucketed × manifest: per-snapshot catalog registration serves the bucket spec; mutations still refuse") {
    // round 15 (VERDICT r14 next #4): bucketing now composes with the
    // manifest protocol — the bucketed base lands inside the ingest
    // segment and the catalog identity is per-snapshot
    val m = localRoot() // catalog tables need a plain-path location
    val layout = StoreLayout(steps = Seq(86400L), buckets = 4,
      quantiles = false, commit = "manifest")
    TsdbStore.ingest(spark, events(), m, layout)
    val name = TsdbStore.bucketedBaseTable(spark, m)
    assert(name.endsWith("_v1"), s"name should carry the snapshot version: $name")
    val t = spark.table(name)
    // content equals the manifest-resolved plain read
    assert(rows(t.select("user_id", "event_type", "event_id", "ts_us", "cents")) ==
      rows(TsdbStore.readTable(spark, m, layout, "base")
        .select("user_id", "event_type", "event_id", "ts_us", "cents")))
    // the co-located shape: agg on the bucket keys plans no exchange
    val agg = t.groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed scan did not satisfy the clustering:\n${plan.take(1200)}")
    // plain-parquet mutations would destroy bucket-file metadata —
    // refused on this layout exactly like on the rename one
    val e = intercept[IllegalArgumentException] {
      TsdbStore.upsertIncremental(spark, replay(), m)
    }
    assert(e.getMessage.contains("bucket"), e.getMessage)
    // a re-ingest commits a new snapshot; resolve registers the new
    // version and drops the stale registration
    TsdbStore.ingest(spark, events(), m, layout)
    val name2 = TsdbStore.bucketedBaseTable(spark, m)
    assert(name2.endsWith("_v2"), name2)
    assert(!spark.catalog.tableExists(name),
      "stale per-snapshot registration must be dropped at resolve")
  }

  // ---- round 16: format v3 (manifest list + per-table manifests +
  //      per-file series-key stats + schema-in-snapshot) and the
  //      optimistic-concurrency retry loop --------------------------

  /** Root paths the relation's file index was HANDED (dirs or files) —
    * the skip evidence: what never appears here was never listed,
    * never opened. */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  /** The snapshot file's table-manifest pointers, table → rel —
    * whole-table `tbl` lines and v4 `band` lines alike (the
    * single-month fixture yields exactly one band per table, so the
    * table key stays unique). */
  private def tblPointers(store: String, version: Long): Map[String, String] = {
    val f = new java.io.File(new java.io.File(store.stripPrefix("rec:")),
      f"_commits/v$version%019d.mf")
    Files.readString(f.toPath).linesIterator.collect {
      case l if l.startsWith("tbl\t") =>
        val Array(_, t, rel) = l.split("\t", 3); t -> rel
      case l if l.startsWith("band\t") =>
        val Array(_, t, _, rel) = l.split("\t", 4); t -> rel
    }.toMap
  }

  test("v3: a commit reuses untouched tables' manifests — O(touched), not O(live partitions)") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = StoreManifest.load(fs, m).version
    val p1 = tblPointers(m, v1)
    assert(p1.size >= 7, s"expected a pointer per live table: $p1")
    // compact ONE base partition: only base's manifest may change
    val dt = StoreManifest.load(fs, m).entries.keys
      .collect { case ("base", d) => d }.min
    TsdbStore.compactPartition(spark, m, dt)
    val v2 = StoreManifest.load(fs, m).version
    val p2 = tblPointers(m, v2)
    assert(p2("base") != p1("base"), "base's manifest must be rewritten")
    (p1.keySet - "base").foreach { t =>
      assert(p2(t) == p1(t), s"untouched table $t's manifest must be reused")
    }
    // the reused manifests parse identically through both snapshots
    val s1 = StoreManifest.loadAt(fs, m, v1)
    val s2 = StoreManifest.loadAt(fs, m, v2)
    assert(s2.entries.filter(_._1._1 == "agg_86400") ==
      s1.entries.filter(_._1._1 == "agg_86400"))
  }

  test("v3 per-file stats: a one-series fetch hands the index FILES, skipping provably-excluded ones") {
    val m = recRoot()
    // production-shaped partitions: many files per dt (a day of
    // microbatches / size-targeted writes). The fixture is too small
    // for the range exchange to split days naturally (AQE coalesces
    // it to ~a task), so cap rows per file — the files still carry
    // tight series ranges because the write is range-clustered
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "8") // ~33 rows/day at sf0.001 ⇒ ~4 files/day
    try TsdbStore.ingest(spark, events(), m, ManifestLayout)
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, m)
    // the fixture must actually have multi-file partitions with
    // recorded per-file series bounds for the skip to be provable
    val baseFiles = snap.files.filter(_._1._1 == "base")
    assert(baseFiles.nonEmpty, "ingest must record per-file stats")
    val multi = baseFiles.filter(_._2.size > 1)
    assert(multi.nonEmpty, "range-clustered ingest should split partitions into several files")
    multi.head._2.foreach { f =>
      assert(f.uidMin.isDefined && f.etMin.isDefined && f.rows.exists(_ > 0), f.toString)
    }
    val twoDays = TsdbStore.fetch(spark, m, 7L, "click", B, B + 2L * 86400L)
    val roots = scanRoots(twoDays)
    assert(roots.nonEmpty && roots.forall(_.endsWith(".parquet")),
      s"series fetch should reach the index with explicit files: $roots")
    // strictly fewer files than the two partitions hold in total, and
    // only files whose recorded uid range admits user 7
    val inRange = baseFiles.filter { case ((_, dt), _) =>
      dt >= "2024-01-10" && dt <= "2024-01-12" }
    val totalFiles = inRange.values.map(_.size).sum
    assert(roots.size < totalFiles,
      s"no file was skipped: ${roots.size} of $totalFiles reached the index")
    // ...and the skip is result-invisible vs the dir-listed whole read
    val whole = TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .filter(col("user_id") === 7 && col("event_type") === "click")
      .filter(col("ts_us") >= B * 1000000L && col("ts_us") < (B + 2L * 86400L) * 1000000L)
      .select(col("ts_us"), (col("cents").cast("double") / 100.0).as("value"))
    assert(rows(twoDays) == rows(whole.orderBy("ts_us")))
    // plan-level whole-table reads keep DIRECTORY roots (the shape
    // RollupSubstitution's live-set-equality guard matches)
    assert(scanRoots(whole).forall(r => !r.endsWith(".parquet")),
      "unfiltered reads must keep directory roots")
  }

  test("optimistic concurrency: disjoint conflict REBASES (no re-run); overlapping conflict re-runs") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = StoreManifest.load(fs, m)
    val dts = base.entries.keys.collect { case ("base", d) => d }.toSeq.sorted
    assert(dts.size >= 2)
    // DISJOINT: our mutation drops base dt0; the racer (injected
    // between our load and our publish) drops agg dt1
    var runs = 0
    val v = StoreManifest.publishOptimistic(fs, m, tornGraceMs = 0L) { snap =>
      runs += 1
      if (runs == 1) // the racer wins the slot first
        StoreManifest.publish(fs, m, snap,
          snap.entries - (("agg_86400", dts(1))),
          snap.stats, snap.props, snap.files, snap.schemas, tornGraceMs = 0L)
      Some(StoreManifest.Mutation(
        entries = snap.entries - (("base", dts(0))),
        stats = snap.stats, files = snap.files, schemas = snap.schemas,
        op = "test-disjoint"))
    }
    assert(runs == 1, "disjoint conflict must rebase, not re-run the mutation")
    assert(v.contains(base.version + 2))
    val merged = StoreManifest.load(fs, m)
    assert(!merged.entries.contains(("base", dts(0))), "our drop must land")
    assert(!merged.entries.contains(("agg_86400", dts(1))), "their drop must survive")
    assert(merged.props.get("op").contains("test-disjoint"))
    // OVERLAPPING: both mutations touch base dt1 — the closure must
    // re-run against the racer's snapshot and see its change
    var runs2 = 0
    var sawRacersChange = false
    StoreManifest.publishOptimistic(fs, m, tornGraceMs = 0L) { snap =>
      runs2 += 1
      if (runs2 == 1)
        StoreManifest.publish(fs, m, snap,
          snap.entries.updated(("base", dts(1)), "_segs/racer/base/dt=" + dts(1)),
          snap.stats, snap.props, snap.files, snap.schemas, tornGraceMs = 0L)
      else sawRacersChange =
        snap.entries.get(("base", dts(1))).contains("_segs/racer/base/dt=" + dts(1))
      Some(StoreManifest.Mutation(
        entries = snap.entries - (("base", dts(1))),
        stats = snap.stats, files = snap.files, schemas = snap.schemas,
        op = "test-overlap"))
    }
    assert(runs2 == 2, "overlapping conflict must re-run the mutation")
    assert(sawRacersChange, "the re-run must see the racer's committed state")
    assert(!StoreManifest.load(fs, m).entries.contains(("base", dts(1))))
  }

  test("optimistic concurrency: two REAL racing upserts on disjoint partitions both commit") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = StoreManifest.load(fs, m).version
    // two replays into DIFFERENT dt windows (their cascade blast radii
    // are disjoint too: rate touches successor partitions, so leave a
    // 2-day gap between the windows); all series — the fixture is too
    // sparse to guarantee one user has samples in both windows
    def window(lo: String, hi: String) =
      events().filter(col("event_type") === "click" &&
          col("ts") >= lit(lo) && col("ts") < lit(hi))
        .withColumn("value", col("value") + 1.0)
    val a = Future(TsdbStore.upsertIncremental(spark, window("2024-01-09", "2024-01-10"), m))
    val b = Future(TsdbStore.upsertIncremental(spark, window("2024-01-13", "2024-01-14"), m))
    val (ta, tb) = (Await.result(a, 5.minutes), Await.result(b, 5.minutes))
    assert(ta.nonEmpty && tb.nonEmpty)
    // BOTH committed (whichever order the race resolved)
    assert(StoreManifest.load(fs, m).version == v0 + 2)
    // ...and the store equals sequential application of both replays
    val twin = localRoot()
    TsdbStore.ingest(spark, events(), twin, ManifestLayout)
    TsdbStore.upsertIncremental(spark, window("2024-01-09", "2024-01-10"), twin)
    TsdbStore.upsertIncremental(spark, window("2024-01-13", "2024-01-14"), twin)
    for (t <- Seq("base", "agg_86400", "rate_86400", "quant_21600")) {
      assert(rows(TsdbStore.readTable(spark, m, ManifestLayout, t)) ==
        rows(TsdbStore.readTable(spark, twin, ManifestLayout, t)), s"table $t diverged")
    }
  }

  test("optimistic concurrency: ADJACENT racing upserts (one creating the successor partition) " +
      "re-run instead of rebasing, and the store matches a serial order (ADVICE r16 #1)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // The silent-wrong-rate shape the rebase classifier must catch:
    // the store ends at partition P; writer A rewrites base P (its
    // snapshot has no P+1, so A writes NO rate P+1); writer B CREATES
    // base P+1 concurrently, deriving rate P+1's first delta from the
    // PRE-A content of base P. Raw written-key sets are disjoint — a
    // rebase would merge them into a state matching NO serial order
    // (B-after-A recomputes rate P+1 from A's new base P). The
    // dtAdjacency closure forces the loser to RE-RUN, so the result
    // must equal winner-then-loser sequential application.
    def seed() = events().filter(col("ts") < lit("2024-01-15"))
    def winA() = // rewrite the last live partition P = 2024-01-14
      events().filter(col("ts") >= lit("2024-01-14") && col("ts") < lit("2024-01-15"))
        .withColumn("value", col("value") + 1.0)
    def winB() = // create the successor partition P+1 = 2024-01-15
      events().filter(col("ts") >= lit("2024-01-15") && col("ts") < lit("2024-01-16"))
    val m = localRoot()
    TsdbStore.ingest(spark, seed(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = StoreManifest.load(fs, m).version
    val fa = Future(TsdbStore.upsertIncremental(spark, winA(), m))
    val fb = Future(TsdbStore.upsertIncremental(spark, winB(), m))
    Await.result(fa, 5.minutes); Await.result(fb, 5.minutes)
    assert(StoreManifest.load(fs, m).version == v0 + 2, "both must commit")
    // serial twins, both orders — the race may resolve either way
    def twin(first: () => DataFrame, second: () => DataFrame): String = {
      val t = localRoot()
      TsdbStore.ingest(spark, seed(), t, ManifestLayout)
      TsdbStore.upsertIncremental(spark, first(), t)
      TsdbStore.upsertIncremental(spark, second(), t)
      t
    }
    val ab = twin(winA _, winB _); val ba = twin(winB _, winA _)
    val tables = Seq("base", "agg_21600", "agg_86400",
      "rate_21600", "rate_86400", "quant_21600", "quant_86400")
    def state(p: String): Seq[Seq[String]] =
      tables.map(t => rows(TsdbStore.readTable(spark, p, ManifestLayout, t)))
    val got = state(m)
    assert(got == state(ab) || got == state(ba),
      "racing adjacent upserts must equal SOME serial order — a rebase " +
        "of the disjoint written sets would keep a rate P+1 derived " +
        "from the pre-race base P")
  }

  test("merge-on-read deleteRows: metadata-sized commit, read equality with eager " +
      "deleteSeries, provably-clean keys no-op") {
    val m = localRoot(); val e = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    TsdbStore.ingest(spark, events(), e, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def segDirs(p: String): Set[String] = {
      val d = new java.io.File(p, "_segs")
      if (!d.exists()) Set.empty else d.listFiles().map(_.getName).toSet
    }
    val before = StoreManifest.load(fs, m)
    val segsBefore = segDirs(m)
    val attached = TsdbStore.deleteRows(spark, m, Seq((7L, "click")))
    val after = StoreManifest.load(fs, m)
    // the metadata-sized-commit claim, mechanically: one new snapshot,
    // ZERO new data segments, no partition moved
    assert(after.version == before.version + 1)
    assert(after.entries == before.entries,
      "a merge-on-read delete must not rewrite or move any partition")
    assert(segDirs(m) == segsBefore,
      "a merge-on-read delete must write no data segment")
    assert(attached.keySet.contains("base") && after.dels.nonEmpty)
    // read equality with the eager rewrite path, every table
    TsdbStore.deleteSeries(spark, e, 7L, "click")
    val tables = Seq("base", "agg_21600", "agg_86400",
      "rate_21600", "rate_86400", "quant_21600", "quant_86400")
    tables.foreach { t =>
      assert(rows(TsdbStore.readTable(spark, m, ManifestLayout, t)) ==
        rows(TsdbStore.readTable(spark, e, ManifestLayout, t)),
        s"merge-on-read vs eager delete diverge on $t")
    }
    // the fetch surface flows through the same filter
    assert(TsdbStore.fetch(spark, m, 7L, "click", B, E, 21600L).isEmpty)
    // a key every file's stats provably exclude: attach nowhere, no-op
    // (no junk snapshot version)
    val att2 = TsdbStore.deleteRows(spark, m, Seq((999999999L, "nosuch")))
    assert(att2.isEmpty)
    assert(StoreManifest.load(fs, m).version == after.version,
      "a provably-clean delete must not commit a snapshot")
  }

  test("merge-on-read deleteRows: rewrites FOLD deletes (compaction drops the " +
      "partition's refs, full upsert folds all), vacuum reclaims the delete file") {
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    TsdbStore.deleteRows(spark, m, Seq((7L, "click")))
    val snap1 = StoreManifest.load(fs, m)
    val dt = snap1.dels.keys.collect { case ("base", d) => d }.toSeq.sorted.head
    val preCompact = rows(TsdbStore.readTable(spark, m, ManifestLayout, "base"))
    TsdbStore.compactPartition(spark, m, dt)
    val snap2 = StoreManifest.load(fs, m)
    assert(!snap2.dels.contains(("base", dt)),
      "compaction reads through the delete filter, so it must drop the folded refs")
    assert(snap2.dels.exists(_._1._1 == "base"),
      "untouched partitions keep their refs")
    assert(rows(TsdbStore.readTable(spark, m, ManifestLayout, "base")) == preCompact,
      "folding must not change what readers see")
    // a full upsert rewrites every data partition -> all refs fold away
    TsdbStore.upsert(spark,
      events().filter(col("user_id") === 3 && col("event_type") === "view")
        .withColumn("value", col("value") + 2.0), m)
    val snap3 = StoreManifest.load(fs, m)
    assert(snap3.dels.isEmpty, "a full rewrite must fold every delete")
    assert(TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .filter(col("user_id") === 7 && col("event_type") === "click").isEmpty,
      "folded deletes are physical: the rows are gone from the files")
    // no retained snapshot references the delete file any more ->
    // vacuum (zero grace) reclaims it
    StoreManifest.vacuum(fs, m, keepManifests = 1, tornGraceMs = 0L)
    val ddir = new java.io.File(m, "_commits/d")
    assert(!ddir.exists() || ddir.listFiles().isEmpty,
      "vacuum must reclaim a delete file no retained snapshot references")
  }

  test("merge-on-read deleteRows: per-partition scope — a post-delete RE-ADD of the key " +
      "reads back even while other partitions still carry the ref") {
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    TsdbStore.deleteRows(spark, m, Seq((7L, "click")))
    // one partition's worth of the key comes BACK (delete-then-add
    // serial order): the upsert rewrites that partition through the
    // filter (folding the old rows, dropping ITS refs) and writes the
    // new rows
    val readd = events().filter(col("user_id") === 7 &&
        col("event_type") === "click" &&
        col("ts") >= lit("2024-01-09") && col("ts") < lit("2024-01-10"))
      .withColumn("value", col("value") + 5.0)
    assert(readd.count() > 0, "fixture must have (7, click) rows on 2024-01-09")
    TsdbStore.upsertIncremental(spark, readd, m)
    val snap = StoreManifest.load(fs, m)
    assert(snap.dels.exists(_._1._1 == "base"),
      "untouched partitions must still carry their refs")
    assert(!snap.dels.contains(("base", "2024-01-09")))
    def visible() = TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .filter(col("user_id") === 7 && col("event_type") === "click")
    assert(visible().count() == readd.count(),
      "exactly the re-added partition's rows must be visible — a GLOBAL " +
        "key filter would erase them under the other partitions' live refs")
    assert(visible().filter(col("dt").cast("string") =!= "2024-01-09").isEmpty)
    // the broadcast anti-join path scopes identically
    spark.conf.set("spark.graft.store.deleteInlineMax", "0")
    try assert(visible().count() == readd.count(),
      "the anti-join path must scope per-partition too")
    finally spark.conf.unset("spark.graft.store.deleteInlineMax")
  }

  test("merge-on-read deleteRows: broadcast anti-join path (inline cap 0) matches the " +
      "inline-predicate path; time travel before the delete still sees the rows") {
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = StoreManifest.load(fs, m).version
    TsdbStore.deleteRows(spark, m, Seq((7L, "click"), (3L, "view")))
    val inline = rows(TsdbStore.readTable(spark, m, ManifestLayout, "base"))
    spark.conf.set("spark.graft.store.deleteInlineMax", "0")
    try {
      assert(rows(TsdbStore.readTable(spark, m, ManifestLayout, "base")) == inline,
        "the anti-join and inline-predicate delete paths must agree")
    } finally spark.conf.unset("spark.graft.store.deleteInlineMax")
    assert(inline.nonEmpty)
    assert(!TsdbStore.readTableAt(spark, m, "base", v0)
      .filter(col("user_id") === 7 && col("event_type") === "click").isEmpty,
      "a pre-delete snapshot must still serve the rows (erasure completes at vacuum)")
  }

  test("format compat: a hand-written v2 manifest still loads (entries + stats, no files/schemas)") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreManifest.load(fs, m)
    val pre = rows(TsdbStore.fetch(spark, m, 7L, "click", B, E))
    def fmt(o: Option[Long]) = o.map(_.toString).getOrElse("-")
    val v2Body = snap.entries.toSeq.sortBy(_._1).map { case ((t, dt), rel) =>
      val st = snap.stats.getOrElse((t, dt), StoreManifest.EntryStats.unknown)
      s"$t\t$dt\t$rel\t${fmt(st.tmin)}\t${fmt(st.tmax)}\t${fmt(st.rows)}\t${fmt(st.bytes)}"
    }
    val text = ("graft-manifest v2" +: v2Body :+ s"end ${v2Body.size}")
      .mkString("\n") + "\n"
    val f = new org.apache.hadoop.fs.Path(
      s"$m/_commits/v${"%019d".format(snap.version + 1)}.mf")
    val out = fs.create(f, false)
    out.write(text.getBytes("UTF-8")); out.close()
    val v2Snap = StoreManifest.load(fs, m)
    assert(v2Snap.version == snap.version + 1)
    assert(v2Snap.entries == snap.entries)
    assert(v2Snap.stats == snap.stats)
    assert(v2Snap.files.isEmpty && v2Snap.schemas.isEmpty)
    // reads fall back to dir listing + footer inference, same rows
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) == pre)
  }

  test("vacuum reclaims table manifests of trimmed snapshots, keeps referenced ones") {
    val m = recRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dt = StoreManifest.load(fs, m).entries.keys
      .collect { case ("base", d) => d }.min
    TsdbStore.compactPartition(spark, m, dt) // base's old manifest orphans
    val live = StoreManifest.load(fs, m)
    val (deleted, _) = StoreManifest.vacuum(fs, m, keepManifests = 1, tornGraceMs = 0L)
    val deadTms = deleted.filter(_.startsWith("_commits/t/"))
    assert(deadTms.nonEmpty, "the replaced base manifest must be reclaimed")
    live.tableManifests.values.foreach { rel =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$m/$rel")),
        s"vacuum deleted a LIVE table manifest: $rel")
    }
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)).nonEmpty)
  }

  test("schema evolution: addColumn is metadata-only; old rows null-complete; new writes carry it") {
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val preSnap = StoreManifest.load(fs, m)
    val preRows = TsdbStore.readTable(spark, m, ManifestLayout, "base").count()
    TsdbStore.addColumn(spark, m, "base",
      org.apache.spark.sql.types.StructField("quality",
        org.apache.spark.sql.types.DoubleType))
    val evolved = StoreManifest.load(fs, m)
    // pure metadata commit: every table manifest reused, entries equal
    assert(evolved.version == preSnap.version + 1)
    assert(evolved.tableManifests == preSnap.tableManifests,
      "addColumn must not rewrite any table manifest")
    assert(evolved.props.get("op").contains("addColumn"))
    // old segments null-complete under the widened declared schema
    val widened = TsdbStore.readTable(spark, m, ManifestLayout, "base")
    assert(widened.columns.contains("quality"))
    assert(widened.count() == preRows)
    assert(widened.filter(col("quality").isNotNull).count() == 0)
    // an upsert whose feed carries the column writes it; rows without stay null
    val replayQ = replay().withColumn("quality", col("user_id").cast("double") + 0.5)
    TsdbStore.upsertIncremental(spark, replayQ, m)
    val after = TsdbStore.readTable(spark, m, ManifestLayout, "base")
    val withQ = after.filter(col("quality").isNotNull)
    assert(withQ.count() > 0, "upserted rows must carry the evolved column")
    assert(rows(withQ.select("quality").distinct()) ==
      Seq("[7.5]"), "quality must equal the feed's expression")
    assert(after.filter(col("quality").isNull).count() ==
      after.count() - withQ.count())
    // cascades keep their contract shapes (the column is non-cascaded)
    assert(!TsdbStore.readTable(spark, m, ManifestLayout, "agg_86400")
      .columns.contains("quality"))
    // fetch parity with a rename-layout twin fed the same mutations —
    // evolution must not disturb the numeric surface
    val r = localRoot()
    TsdbStore.ingest(spark, events(), r, StoreLayout())
    TsdbStore.upsertIncremental(spark, replay(), r)
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E)) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E)))
    assert(rows(TsdbStore.fetch(spark, m, 7L, "click", B, E, 86400L, "average")) ==
      rows(TsdbStore.fetch(spark, r, 7L, "click", B, E, 86400L, "average")))
    // pre-evolution feeds keep working (extras null-completed)
    TsdbStore.upsertIncremental(spark,
      replay().withColumn("value", col("value") + 1.0), m)
    assert(TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .filter(col("quality").isNotNull).count() == 0,
      "a later extras-less replay overwrites with null quality (last write wins)")
    // guards: rename layout and non-nullable additions are refused
    val e1 = intercept[IllegalArgumentException] {
      TsdbStore.addColumn(spark, r, "base",
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))
    }
    assert(e1.getMessage.contains("manifest"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TsdbStore.addColumn(spark, m, "base",
        org.apache.spark.sql.types.StructField("y",
          org.apache.spark.sql.types.LongType, nullable = false))
    }
    assert(e2.getMessage.contains("nullable"), e2.getMessage)
  }

  test("schema evolution: renameColumn/dropColumn are metadata-only; mixed vintages " +
      "resolve through the name history; the tail decodes every vintage; tombstones " +
      "block name reuse; time travel serves each snapshot's OWN schema") {
    import org.apache.spark.sql.types.{DoubleType, StructField}
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    TsdbStore.addColumn(spark, m, "base", StructField("quality", DoubleType))
    // OLD-NAME vintage: (7, click) over [01-09, 01-13) carries `quality`
    TsdbStore.upsertIncremental(spark,
      replay().withColumn("quality", col("user_id").cast("double") + 0.5), m)
    val preRename = StoreManifest.load(fs, m)
    val expect = rows(TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .withColumnRenamed("quality", "quality_score"))
    TsdbStore.renameColumn(spark, m, "base", "quality", "quality_score")
    val post = StoreManifest.load(fs, m)
    // pure metadata: one snapshot, every table manifest reused
    assert(post.version == preRename.version + 1)
    assert(post.tableManifests == preRename.tableManifests,
      "renameColumn must not rewrite any table manifest")
    val renamedDf = TsdbStore.readTable(spark, m, ManifestLayout, "base")
    assert(renamedDf.columns.contains("quality_score") &&
      !renamedDf.columns.contains("quality"))
    assert(rows(renamedDf) == expect,
      "old-name segments must resolve through the name history, values intact")
    // NEW-NAME vintage over a DISJOINT window: three file vintages
    // (no-column, old-name, new-name) are now live at once
    TsdbStore.upsertIncremental(spark,
      events().filter(col("ts") >= lit("2024-01-14") && col("ts") < lit("2024-01-16"))
        .withColumn("value", col("value") + 1.0)
        .withColumn("quality_score", lit(3.25)),
      m)
    val mixed = TsdbStore.readTable(spark, m, ManifestLayout, "base")
    assert(rows(mixed.filter(col("quality_score").isNotNull)
        .select("quality_score").distinct()) == Seq("[3.25]", "[7.5]"),
      "old-name and new-name vintages must BOTH resolve into the current column")
    // the CDC tail decodes the old-name vintage under the current name
    val sink = "rename_tail_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream
      .format(classOf[graft.sources.StoreTailSource].getName)
      .option("path", m).load()
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    assert(spark.table(sink).columns.contains("quality_score"))
    assert(spark.table(sink).filter(col("quality_score") === 7.5).count() > 0,
      "the tail must decode old-name files through the same name history")
    // time travel serves the pre-rename snapshot under ITS schema
    val asOf = TsdbStore.readTableAt(spark, m, "base", preRename.version)
    assert(asOf.columns.contains("quality") && !asOf.columns.contains("quality_score"))
    // guards: historical names stay reserved; canonical columns immutable
    val g1 = intercept[IllegalArgumentException] {
      TsdbStore.renameColumn(spark, m, "base", "quality_score", "quality") }
    assert(g1.getMessage.contains("in use"), g1.getMessage)
    val g2 = intercept[IllegalArgumentException] {
      TsdbStore.renameColumn(spark, m, "base", "user_id", "uid") }
    assert(g2.getMessage.contains("canonical"), g2.getMessage)
    // DROP: pure metadata; gone from live reads; name + history tombstoned
    val preDrop = StoreManifest.load(fs, m)
    TsdbStore.dropColumn(spark, m, "base", "quality_score")
    assert(StoreManifest.load(fs, m).tableManifests == preDrop.tableManifests,
      "dropColumn must not rewrite any table manifest")
    assert(!TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .columns.contains("quality_score"))
    val g3 = intercept[IllegalArgumentException] {
      TsdbStore.addColumn(spark, m, "base", StructField("quality", DoubleType)) }
    assert(g3.getMessage.contains("DROPPED"), g3.getMessage)
    val g4 = intercept[IllegalArgumentException] {
      TsdbStore.addColumn(spark, m, "base", StructField("quality_score", DoubleType)) }
    assert(g4.getMessage.contains("DROPPED"), g4.getMessage)
    // a fresh name is fine, and time travel still serves the dropped column
    TsdbStore.addColumn(spark, m, "base", StructField("quality2", DoubleType))
    assert(TsdbStore.readTable(spark, m, ManifestLayout, "base")
      .columns.contains("quality2"))
    assert(TsdbStore.readTableAt(spark, m, "base", preDrop.version)
      .columns.contains("quality_score"))
  }

  test("manifest banding v4: a one-partition commit rewrites ONE band manifest + the " +
      "list; untouched bands and tables reuse pointers; ranged resolution parses only " +
      "bands in range") {
    val m = localRoot()
    val jan = events()
    // a second calendar month: same series, ids offset so no key collides
    val feb = jan.withColumn("ts", col("ts") + expr("INTERVAL 31 DAYS"))
      .withColumn("event_id", col("event_id") + 1000000000L)
    TsdbStore.ingest(spark, jan.unionByName(feb), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap0 = StoreManifest.load(fs, m)
    assert(snap0.tableManifests.contains(("base", "2024-01")) &&
      snap0.tableManifests.contains(("base", "2024-02")),
      s"expected month bands, got ${snap0.tableManifests.keys.toSeq.sorted}")
    def tmFiles(): Set[String] =
      new java.io.File(m, "_commits/t").listFiles().map(_.getName)
        .filter(_.endsWith(".tm")).toSet
    val before = tmFiles()
    val dt = snap0.entries.keys.collect {
      case ("base", d) if d.startsWith("2024-01") => d }.min
    TsdbStore.compactPartition(spark, m, dt)
    val snap1 = StoreManifest.load(fs, m)
    assert((tmFiles() -- before).size == 1,
      "a commit touching one partition must write exactly ONE band manifest")
    assert(snap1.tableManifests(("base", "2024-02")) ==
      snap0.tableManifests(("base", "2024-02")),
      "the untouched band's pointer must be reused verbatim")
    assert(snap1.tableManifests(("base", "2024-01")) !=
      snap0.tableManifests(("base", "2024-01")))
    assert(snap1.tableManifests.filter(_._1._1 != "base") ==
      snap0.tableManifests.filter(_._1._1 != "base"),
      "untouched tables must re-emit all their pointers")
    // ranged resolution parses only the bands the range can touch
    StoreManifest.clearParseCaches()
    val p0 = StoreManifest.tmParses
    val febFetch = TsdbStore.fetch(spark, m, 7L, "click",
      1707436800L, 1707523200L) // [2024-02-09, 2024-02-10) — one replica day
    val parsed = StoreManifest.tmParses - p0
    assert(parsed == 1,
      s"a one-day February base fetch must parse exactly the February base band, parsed $parsed")
    assert(febFetch.count() > 0, "the February replica must actually serve rows")
    // a fetch whose range precedes every live band: typed empty, no error
    assert(TsdbStore.fetch(spark, m, 7L, "click",
      1672531200L, 1672617600L).isEmpty) // 2023-01-01
  }

  test("vacuum lease: a mutation racing a leased vacuum fails LOUDLY (never silently " +
      "loses data); a second vacuum is refused; a crashed vacuum's lease expires") {
    val m = localRoot()
    TsdbStore.ingest(spark, events(), m, ManifestLayout)
    val fs = new org.apache.hadoop.fs.Path(m)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = StoreManifest.load(fs, m).version
    // a vacuum holds the lease (acquired exactly as TsdbStore.vacuum
    // does, held open so the race is deterministic)
    StoreManifest.acquireVacuumLease(fs, m, leaseMs = 60000L)
    try {
      val e1 = intercept[IllegalStateException] {
        TsdbStore.upsertIncremental(spark, replay(), m)
      }
      assert(e1.getMessage.contains("vacuum holds the lease"), e1.getMessage)
      assert(StoreManifest.load(fs, m).version == v0,
        "the refused mutation must not have committed anything")
      val e2 = intercept[IllegalStateException] {
        StoreManifest.acquireVacuumLease(fs, m, leaseMs = 60000L)
      }
      assert(e2.getMessage.contains("another vacuum"), e2.getMessage)
    } finally StoreManifest.releaseVacuumLease(fs, m)
    // released: the same mutation now commits
    TsdbStore.upsertIncremental(spark, replay(), m)
    assert(StoreManifest.load(fs, m).version == v0 + 1)
    // a crashed vacuum's lease expires on its own — both a fresh
    // vacuum and ordinary mutations proceed past it
    val expired = new org.apache.hadoop.fs.Path(s"$m/_commits/vacuum.lease")
    val out = fs.create(expired, true)
    try out.write(s"${System.currentTimeMillis() - 1L}\n".getBytes("UTF-8"))
    finally out.close()
    spark.conf.set("spark.graft.store.vacuumGraceMs", "0")
    try TsdbStore.vacuum(spark, m, keepManifests = 2)
    finally spark.conf.unset("spark.graft.store.vacuumGraceMs")
    assert(!fs.exists(expired), "vacuum must release its lease")
    TsdbStore.upsertIncremental(spark,
      replay().withColumn("value", col("value") + 1.0), m)
    assert(StoreManifest.load(fs, m).version == v0 + 2)
  }

  private def manifestCount(store: String): Int =
    new java.io.File(new java.io.File(store.stripPrefix("rec:")), "_commits")
      .listFiles().count(_.getName.endsWith(".mf"))
}
