package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.TsdbStore

/** What a concurrent reader sees around [[TsdbStore]]'s staged-then-
  * rename partition swap (VERDICT r12 next #6): the swap is two atomic
  * metadata renames — retire live, install staged — so on an
  * atomic-rename filesystem a reader observes exactly one of three
  * states, each pinned here: WHOLE-old (before), WHOLE-new (after), or
  * a loud/absent partition during the two-rename window. Never a mixed
  * directory, and never torn files: in-flight reads that opened a file
  * pre-swap finish against the old bytes (POSIX keeps the inode alive
  * under rename/unlink). The single-WRITER side of the contract is
  * documented at swapPartitionDir: one maintenance writer per
  * partition at a time. */
class SwapSemanticsSpec extends SparkSpec {

  private lazy val store: String = {
    val p = Files.createTempDirectory("graft-swapsem").toString
    TsdbStore.ingest(spark, Tables.events(spark, Sf).limit(2000), p)
    p
  }

  private def firstDt: String = new java.io.File(s"$store/base").listFiles()
    .map(_.getName).filter(_.startsWith("dt=")).sorted.head.stripPrefix("dt=")

  test("reader sees whole-old before and whole-new after a swap — " +
      "same row bag, never a union of staged and live files") {
    val dt = firstDt
    val before = spark.read.parquet(s"$store/base/dt=$dt").cache()
    val nBefore = before.count()
    TsdbStore.compactPartition(spark, store, dt, targetFiles = 1)
    val after = spark.read.parquet(s"$store/base/dt=$dt")
    // a mixed view (old + new files listed together) would double the
    // bag; whole-directory rename makes that unobservable
    assert(after.count() == nBefore)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    before.unpersist(): Unit
  }

  test("mid-swap window: a direct partition read fails LOUDLY and a " +
      "whole-table read omits the in-flight partition — never partial " +
      "data") {
    val dt = firstDt
    val live = Paths.get(s"$store/base/dt=$dt")
    val retired = Paths.get(s"$store/base_retired_test/dt=$dt")
    Files.createDirectories(retired.getParent)
    // the swap's FIRST rename, frozen mid-sequence
    Files.move(live, retired)
    try {
      // a reader addressing the partition path directly fails loudly —
      // there is no state in which it could see half a directory
      intercept[Exception] {
        spark.read.parquet(s"$store/base/dt=$dt").count()
      }
      // a whole-table reader sees the store WITHOUT the in-flight
      // partition for the duration of the (one-metadata-op) window:
      // complete partitions only, silently short. This is the one
      // mid-swap read that does NOT fail — callers needing a stable
      // whole-table view must not race maintenance (the single-writer
      // contract extends to "no whole-table snapshot readers
      // mid-swap").
      val rest = spark.read.parquet(s"$store/base")
      assert(!rest.select("dt").distinct().collect()
        .exists(_.getAs[Any]("dt").toString == dt))
    } finally {
      // the swap's SECOND rename: install (here: restore) — reader is
      // whole again
      Files.move(retired, live)
    }
    assert(spark.read.parquet(s"$store/base/dt=$dt").count() > 0)
  }

  test("in-flight reads opened before the swap finish against the OLD " +
      "bytes (rename keeps the inode alive)") {
    val dt = firstDt
    val file = new java.io.File(s"$store/base/dt=$dt").listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val expected = Files.readAllBytes(file.toPath)
    val in = new java.io.FileInputStream(file)
    try {
      val head = in.readNBytes(16)
      // full swap while the handle is open: retire + install a copy
      val live = Paths.get(s"$store/base/dt=$dt")
      val retired = Paths.get(s"$store/base_retired_test2/dt=$dt")
      Files.createDirectories(retired.getParent)
      Files.move(live, retired)
      Files.createDirectories(live)
      try {
        val tail = in.readAllBytes()
        assert((head ++ tail).sameElements(expected),
          "in-flight read diverged from the pre-swap bytes")
      } finally {
        // restore the fixture for later tests
        Files.delete(live)
        Files.move(retired, live)
      }
    } finally in.close()
  }
}
