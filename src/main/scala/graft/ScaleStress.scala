package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness (VERDICT r6 next #5): the empirical check
  * behind every "scales to 100 TB" claim — replicate the sf corpus
  * `factor`× and demand the heavy operator family grows ~linearly.
  *
  * The replicas are deliberately made structurally INDEPENDENT, not
  * byte-identical: byte-identical copies would turn every document
  * into a `factor`-member near-dup family and grow the candidate-pair
  * space quadratically — a different workload, not a bigger one.
  *  - documents: per-replica Caesar-shifted text (a bijective char
  *    map preserves within-replica shingle structure exactly while
  *    cross-replica shingle overlap drops to ~0), offset doc_ids;
  *  - embeddings: per-replica array rotation (orthogonal, norm- and
  *    within-replica-cosine-preserving; cross-replica cosines
  *    scrambled), offset vec_ids;
  *  - events: offset user_ids — `factor`× the series over the same
  *    time range, the natural scale direction of a TSDB.
  *
  * Run:  sbt "runMain graft.ScaleStress [sfDir] [factor] [workDir] [mode]"
  * Emits one JSON line per query {name, sec_1x, sec_Nx, ratio} plus a
  * summary; ratios land in BASELINE.md. A ratio well above `factor`
  * flags superlinear behavior (pair blow-up, spill, a driver-side
  * collect) in that operator.
  *
  * `mode = store` (VERDICT r7 next #6) runs the store family ONLY —
  * events replicate without the alphabet-bound Caesar transform, so
  * the factor cap rises to 128 and a second decade (100×) becomes
  * reachable. Store-mode rows additionally carry the run's shuffle
  * spill (memory + disk bytes) and max per-task peak execution
  * memory, captured by a SparkListener and drained through the
  * listener-bus bridge before each snapshot — turning "per-series
  * reads are factor-invariant and nothing spills" into measured
  * numbers rather than plan-shape claims.
  */
object ScaleStress {

  /** Accumulates task-level spill / peak-memory over a timed run.
    * Reset before each query; the bus is drained (ListenerBridge)
    * before reading so late async task-end events can't leak across
    * queries. */
  private final class MetricsListener
      extends org.apache.spark.scheduler.SparkListener {
    var memSpill = 0L
    var diskSpill = 0L
    var peakExecMem = 0L
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        val m = t.taskMetrics
        if (m != null) {
          memSpill += m.memoryBytesSpilled
          diskSpill += m.diskBytesSpilled
          peakExecMem = math.max(peakExecMem, m.peakExecutionMemory)
        }
      }
    def reset(): Unit = synchronized {
      memSpill = 0L; diskSpill = 0L; peakExecMem = 0L
    }
  }

  private val Heavy = Seq(
    "q_dedup_cluster", "q_dedup_jaccard_grid", "q_dedup_containment",
    "q_dedup_substring", "q_sim_ann_ivf_pq", "q_sim_ann_ivf_pq_refine",
    "q_ts_gap_interp",
    // retrieval/LM text family (rounds 8-9): the Caesar replicas grow
    // the vocabulary ~factor× (shifted alphabets), so these also test
    // that the "vocab-bounded broadcast" claims hold as vocab grows
    "q_text_bm25", "q_text_pmi", "q_text_ppl_filter",
    // round-9 viz downsamples: window-over-one-exchange shapes on the
    // factor×-series events replica
    "q_ts_downsample_m4", "q_ts_downsample_tri",
    // round-10 sequential LTTB: the streaming per-series fold must
    // stay ~factor-linear (replicas add SERIES, not per-series length,
    // so the two-bucket task memory and the chain depth are invariant)
    "q_ts_downsample_lttb",
    // round-10 counter/estimate reads: irate's WindowGroupLimit top-1
    // keeps the desc rank bounded per series; histogram_quantile's
    // filtered-count agg has a fixed-width state row per group, so
    // both should grow ~linearly in scanned rows and no worse
    "q_ts_irate", "q_ts_histogram_quantile",
    // round-10 robust/forecast family: the Holt chunked matrix scan
    // (collect_list bounded by chunkSize), the batch-evaluated keyed-
    // state fold, and the single-exchange multi-window shapes — all
    // per-series, so 10× SERIES should fill cores, not queue
    "q_ts_holt", "q_stream_holt", "q_ts_mad", "q_ts_weighted_median",
    "q_ts_autocorr",
    // round 18 (VERDICT r17 #5): the round-17 dedup kernels at the
    // scale arm — minhash's no-persist posexplode banding under AQE
    // stage reuse, simhash's posexplode chunk join at real multi-split
    // parallelism, and (via q_dedup_cluster above) the CC driver
    // fast-path cap against a 10x survivor distribution
    "q_dedup_minhash", "q_dedup_simhash")

  /** Store family: `factor`× the series over the same range. The
    * per-series reads (fetch, quantile) should be ~factor-INVARIANT —
    * series-key pushdown + dt pruning reach one series' row groups no
    * matter how many neighbors exist; the fleet-wide reads (rollup,
    * DAU) and the ingest itself should grow ~linearly. */
  private val Store = Seq(
    "q_store_fetch", "q_store_quantile", "q_store_rollup",
    "q_store_rollup_raw", "q_store_rollup_dau",
    // round-10 cascade reads: the M4 endpoint substitution and the
    // over-dense approx quantile both scan cascade rows only, so they
    // should scale with |series|·slots, never with raw sample count
    "q_store_rollup_m4", "q_store_rollup_quantile_approx")

  /** Manifest-layout family (`mode = manifest`, round 16 — VERDICT r15
    * missing #4): the same factor-invariance question as `store`, asked
    * of the SNAPSHOT-resolved read path — manifest load, per-file
    * series-key skip, single-relation construction — plus the path's
    * only O(store-size) driver-side work, snapshot RESOLUTION itself
    * (measured separately as plan-construction time, no execution). */
  private val Manifest = Seq(
    "q_store_manifest_fetch", "q_store_manifest_bulk",
    "q_store_manifest_rollup", "q_store_manifest_rollup_raw",
    "q_store_manifest_asof", "q_store_manifest_evolve")

  /** Series-LENGTH direction (`mode = long`, round 10): same series
    * keys, `factor`× MORE samples per series (replicas shift TIME by
    * k·span, ids offset for uniqueness). This is the axis the
    * series-count replicas can't test: every per-series sequential
    * claim — Holt's chunked matrix scan, the keyed-state fold, LTTB's
    * two-bucket fold, the single-exchange multi-window shapes — says
    * task memory is bounded by chunk/frame size, never series length.
    * Long-mode rows carry peak task memory at BOTH scales so that
    * claim is a measured number, not a scaladoc sentence. */
  private val LengthHeavy = Seq(
    "q_ts_holt", "q_ts_ema", "q_ts_downsample_lttb",
    "q_ts_mad", "q_ts_weighted_median", "q_ts_autocorr", "q_ts_irate",
    "q_ts_downsample_m4",
    // round 11: q_stream_holt joined this mode once its declared batch
    // evaluation became holtSequential (repartition + EXTERNAL sort +
    // 24-byte group-boundary fold) — the sort buffer is
    // TaskMemoryManager-tracked, so the peak column now measures the
    // real per-task footprint instead of hiding a whole-series
    // it.toSeq on plain JVM heap (the r10 weak row, closed)
    "q_stream_holt")
  // One deliberate exclusion:
  //  - q_ts_gap_interp: its grid is the fixed January window, so on a
  //    time-extended corpus the pushed-down range predicate correctly
  //    skips the added months — the measured 10× point (2.6 s vs 4.1 s
  //    at 1×, peak 31 MB vs 220 MB) demonstrates PRUNING, not length
  //    scaling, and would misread as the latter.

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val work = if (args.length > 2) args(2) else "/tmp/graft_scale"
    val storeOnly = args.length > 3 && args(3) == "store"
    val longOnly = args.length > 3 && args(3) == "long"
    val manifestOnly = args.length > 3 && args(3) == "manifest"
    val manifestLong = args.length > 3 && args(3) == "manifestlong"
    val eraseMode = args.length > 3 && args(3) == "erase"
    val tailMode = args.length > 3 && args(3) == "tail"
    // the Caesar decorrelation is alphabet-bound (26 shifts); events
    // replicate by id offset only, so store/long modes reach 100×+
    val maxFactor =
      if (storeOnly || longOnly || manifestOnly || manifestLong ||
        eraseMode || tailMode) 128
      else 26
    require(factor >= 2 && factor <= maxFactor,
      s"factor must be in [2, $maxFactor]${if (storeOnly) " (store mode)" else ""}: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // tz-naive parquet timestamps read as UTC instants, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = s"$work/x$factor"
    if (longOnly || manifestLong || eraseMode || tailMode)
      buildLongCorpus(spark, sfDir, big, factor)
    else buildCorpus(spark, sfDir, big, factor,
      eventsOnly = storeOnly || manifestOnly)

    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    def drain(): Unit =
      org.apache.spark.graftshim.ListenerBridge.flush(spark.sparkContext)

    // JVM/codegen warmup (untimed), like Bench
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    /** Time one noop-sink run; returns (sec, memSpill, diskSpill,
      * peakTaskMem) with the listener bus drained around the window. */
    def timed(name: String, dir: String): (Double, Long, Long, Long) = {
      drain(); metrics.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      (sec, metrics.memSpill, metrics.diskSpill, metrics.peakExecMem)
    }
    def time(name: String, dir: String): Double = timed(name, dir)._1

    if (longOnly) {
      // length axis: per-query peak task memory at both scales IS the
      // result — a per-series op whose memory grows with series length
      // would show peak_Nx ≈ factor × peak_1x here
      val mb = (b: Long) => b / (1024 * 1024)
      val rows = LengthHeavy.map { name =>
        // untimed per-query warmup at 1×: without it the first timed
        // pass absorbs the typed-encoder/HOF codegen cold start and the
        // 1× side reads high (observed q_ts_holt 3.0 s cold vs 1.9 s at
        // 10× — a nonsense <1 ratio on 10× the data)
        try time(name, sfDir) catch { case _: Throwable => () }
        val (t1, _, _, p1) = timed(name, sfDir)
        val (tN, mN, dN, pN) = timed(name, big)
        val ratio = tN / t1
        println(f"""{"query":"$name","sec_1x":$t1%.3f,"sec_${factor}x":$tN%.3f,"ratio":$ratio%.2f,"peak_1x_mb":${mb(p1)},"peak_${factor}x_mb":${mb(pN)},"spill_${factor}x_mb":${mb(mN + dN)}}""")
        (name, t1, tN, ratio, pN)
      }
      val worst = rows.maxBy(_._4)
      val sum1 = rows.map(_._2).sum; val sumN = rows.map(_._3).sum
      println(f"""{"metric":"scale_stress_long","factor":$factor,"sum_1x_sec":$sum1%.3f,"sum_${factor}x_sec":$sumN%.3f,"sum_ratio":${sumN / sum1}%.2f,"worst":"${worst._1}","worst_ratio":${worst._4}%.2f,"max_peak_task_mb":${mb(rows.map(_._5).max)}}""")
      spark.stop()
      return
    }

    if (manifestLong) {
      // PARTITION-COUNT axis (round 16 — the caveat the series-count
      // 100× arm cannot answer: its calendar is fixed, so live
      // partitions stay constant). The long corpus extends TIME by
      // `factor`, so a manifest ingest here has factor× dt partitions
      // per table, factor× entry/file lines in the base table
      // manifest, and the question is whether snapshot RESOLUTION —
      // the read path's only O(store-size) driver work — stays flat
      // when the metadata itself grows.
      def ingestM(dir: String, tgt: String): Double = {
        val t0 = System.nanoTime()
        graft.sources.TsdbStore.ingest(spark, Tables.events(spark, dir), tgt,
          graft.sources.StoreLayout(commit = "manifest"))
        (System.nanoTime() - t0) / 1e9
      }
      val ing1 = ingestM(sfDir, s"$work/mlstore_1x")
      val ingN = ingestM(big, s"$work/mlstore_${factor}x")
      def resolveSec(store: String): Double = {
        graft.sources.TsdbStore.fetch(spark, store, 7L, "click",
          1704844800L, 1705708800L) // warm fs metadata + manifest cache
        val reps = 20
        val t0 = System.nanoTime()
        var i = 0
        while (i < reps) {
          graft.sources.TsdbStore.fetch(spark, store, 7L, "click",
            1704844800L, 1705708800L)
          i += 1
        }
        (System.nanoTime() - t0) / 1e9 / reps
      }
      // COLD resolution too: clear the immutable-manifest parse cache
      // between reps by re-reading through a fresh snapshot load —
      // approximated here as the FIRST fetch after ingest (reported
      // separately as cold_1 since the cache keys by path)
      val r1 = resolveSec(s"$work/mlstore_1x")
      val rN = resolveSec(s"$work/mlstore_${factor}x")
      // COLD per-band parse counts (round 17, v4 banding): how many
      // band manifests a two-week flagship fetch actually parses from
      // a cache-less JVM — banded resolution should parse O(bands in
      // range) no matter how many live bands the factor added
      def coldParses(store: String): Long = {
        graft.sources.StoreManifest.clearParseCaches()
        val p0 = graft.sources.StoreManifest.tmParses
        graft.sources.TsdbStore.fetch(spark, store, 7L, "click",
          1704844800L, 1705708800L)
        graft.sources.StoreManifest.tmParses - p0
      }
      val cp1 = coldParses(s"$work/mlstore_1x")
      val cpN = coldParses(s"$work/mlstore_${factor}x")
      val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val snap1 = graft.sources.StoreManifest.load(lfs, s"$work/mlstore_1x")
      val snapN = graft.sources.StoreManifest.load(lfs, s"$work/mlstore_${factor}x")
      val parts1 = snap1.entries.size
      val partsN = snapN.entries.size
      println(f"""{"metric":"scale_stress_manifest_long","factor":$factor,"ingest_1x_sec":$ing1%.3f,"ingest_${factor}x_sec":$ingN%.3f,"ingest_ratio":${ingN / ing1}%.2f,"live_entries_1x":$parts1,"live_entries_${factor}x":$partsN,"live_bands_1x":${snap1.tableManifests.size},"live_bands_${factor}x":${snapN.tableManifests.size},"cold_fetch_band_parses_1x":$cp1,"cold_fetch_band_parses_${factor}x":$cpN,"resolve_1x_sec":$r1%.4f,"resolve_${factor}x_sec":$rN%.4f,"resolve_ratio":${rN / r1}%.2f}""")
      spark.stop()
      return
    }

    if (eraseMode) {
      // THE GDPR-ERASURE SHAPE (round 17, VERDICT r16 missing #1): the
      // time-extended corpus gives a long-lived series factor× dt
      // partitions at every cascade level. Eager deleteSeries rewrites
      // them ALL; merge-on-read deleteRows writes one delete file +
      // band-manifest refs. The result is the ratio pair: eager erase
      // cost grows with the factor, lazy erase cost stays metadata-
      // sized — plus the measured read-side cost of fetching THROUGH
      // the tombstone before any fold.
      def build(dir: String, tgt: String): Unit =
        graft.sources.TsdbStore.ingest(spark, Tables.events(spark, dir), tgt,
          graft.sources.StoreLayout(commit = "manifest"))
      def secOf(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val B = 1704844800L; val E = 1705708800L
      def arm(dir: String, tag: String): String = {
        val e = s"$work/estore_eager_$tag"; val l = s"$work/estore_lazy_$tag"
        build(dir, e); build(dir, l)
        var eagerTouched = 0
        var lazyTouched = 0
        val fetchPre = secOf {
          graft.sources.TsdbStore.fetch(spark, l, 3L, "view", B, E).count(): Unit }
        val eager = secOf {
          eagerTouched = graft.sources.TsdbStore
            .deleteSeries(spark, e, 7L, "click").values.map(_.size).sum }
        val lazyT = secOf {
          lazyTouched = graft.sources.TsdbStore
            .deleteRows(spark, l, Seq((7L, "click"))).values.map(_.size).sum }
        val fetchPost = secOf {
          graft.sources.TsdbStore.fetch(spark, l, 3L, "view", B, E).count(): Unit }
        f""""eager_${tag}_sec":$eager%.3f,"lazy_${tag}_sec":$lazyT%.3f,""" +
          f""""eager_${tag}_partitions":$eagerTouched,"lazy_${tag}_refs":$lazyTouched,""" +
          f""""fetch_pre_${tag}_sec":$fetchPre%.3f,"fetch_tombstoned_${tag}_sec":$fetchPost%.3f"""
      }
      val a1 = arm(sfDir, "1x")
      val aN = arm(big, s"${factor}x")
      println(s"""{"metric":"scale_stress_erase","factor":$factor,$a1,$aN}""")
      spark.stop()
      return
    }

    if (tailMode) {
      // CDC tail DRAIN THROUGHPUT (round 17, VERDICT r16 next #4): a
      // full AvailableNow drain of the store's change feed through the
      // parquet-mr Group decoder, measured as rows/sec at both scales —
      // the number the BASELINE row publishes for the lambda loop's
      // read half.
      def build(dir: String, tgt: String): Unit =
        graft.sources.TsdbStore.ingest(spark, Tables.events(spark, dir), tgt,
          graft.sources.StoreLayout(commit = "manifest"))
      def drainOf(store: String): (Long, Double) = {
        val cnt = new java.util.concurrent.atomic.AtomicLong
        val t0 = System.nanoTime()
        val q = spark.readStream
          .format(classOf[graft.sources.StoreTailSource].getName)
          .option("path", store).load()
          .writeStream.foreachBatch {
            (df: org.apache.spark.sql.DataFrame, _: Long) =>
              cnt.addAndGet(df.count()): Unit
          }
          .option("checkpointLocation", s"$store/_tailckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        (cnt.get(), (System.nanoTime() - t0) / 1e9)
      }
      build(sfDir, s"$work/tstore_1x")
      build(big, s"$work/tstore_${factor}x")
      val (r1, s1) = drainOf(s"$work/tstore_1x")
      val (rN, sN) = drainOf(s"$work/tstore_${factor}x")
      println(f"""{"metric":"scale_stress_tail","factor":$factor,"rows_1x":$r1,"drain_1x_sec":$s1%.3f,"rows_per_sec_1x":${r1 / s1}%.0f,"rows_${factor}x":$rN,"drain_${factor}x_sec":$sN%.3f,"rows_per_sec_${factor}x":${rN / sN}%.0f,"throughput_ratio":${(rN / sN) / (r1 / s1)}%.2f}""")
      spark.stop()
      return
    }

    if (manifestOnly) {
      // ingest under the snapshot-commit protocol at both scales
      def timeIngestM(dir: String, tgt: String): (Double, Long, Long, Long) = {
        drain(); metrics.reset()
        val t0 = System.nanoTime()
        graft.sources.TsdbStore.ingest(spark, Tables.events(spark, dir), tgt,
          graft.sources.StoreLayout(commit = "manifest"))
        val sec = (System.nanoTime() - t0) / 1e9
        drain()
        (sec, metrics.memSpill, metrics.diskSpill, metrics.peakExecMem)
      }
      def spillJson(m: Long, d: Long, p: Long): String =
        s""""spill_mem_mb":${m >> 20},"spill_disk_mb":${d >> 20},"peak_task_mem_mb":${p >> 20}"""
      val (ing1, _, _, _) = timeIngestM(sfDir, s"$work/mstore_1x")
      val (ingN, imN, idN, ipN) = timeIngestM(big, s"$work/mstore_${factor}x")
      println(f"""{"query":"manifest_ingest","sec_1x":$ing1%.3f,"sec_${factor}x":$ingN%.3f,"ratio":${ingN / ing1}%.2f,${spillJson(imN, idN, ipN)}}""")
      // declared-query fixtures build untimed (full mutation lifecycle)
      graft.sources.StoreFixture.manifestStore(spark, sfDir)
      graft.sources.StoreFixture.manifestStore(spark, big)
      graft.sources.StoreFixture.manifestStoreEvolved(spark, sfDir)
      graft.sources.StoreFixture.manifestStoreEvolved(spark, big)
      val rows = Manifest.map { name =>
        val t1 = time(name, sfDir)
        val (tN, qm, qd, qp) = timed(name, big)
        println(f"""{"query":"$name","sec_1x":$t1%.3f,"sec_${factor}x":$tN%.3f,"ratio":${tN / t1}%.2f,${spillJson(qm, qd, qp)}}""")
        (name, t1, tN, tN / t1)
      }
      // snapshot RESOLUTION cost, isolated: construct the flagship
      // fetch's DataFrame (manifest-list read → table-manifest parse →
      // entry/file pruning → explicit-file index) WITHOUT executing
      // it — the driver-side work that scales with store size, and the
      // piece a 1000-executor cluster serializes through the driver
      def resolveSec(dir: String): Double = {
        val store = graft.sources.StoreFixture.manifestStore(spark, dir)
        // warm (fs metadata cache, first manifest parse)
        graft.sources.TsdbStore.fetch(spark, store, 7L, "click",
          1704844800L, 1705708800L)
        val reps = 20
        val t0 = System.nanoTime()
        var i = 0
        while (i < reps) {
          graft.sources.TsdbStore.fetch(spark, store, 7L, "click",
            1704844800L, 1705708800L)
          i += 1
        }
        (System.nanoTime() - t0) / 1e9 / reps
      }
      val r1 = resolveSec(sfDir)
      val rN = resolveSec(big)
      println(f"""{"query":"manifest_resolve_plan","sec_1x":$r1%.4f,"sec_${factor}x":$rN%.4f,"ratio":${rN / r1}%.2f}""")
      val mSum1 = ing1 + rows.map(_._2).sum
      val mSumN = ingN + rows.map(_._3).sum
      println(f"""{"metric":"scale_stress_manifest","factor":$factor,"sum_1x_sec":$mSum1%.3f,"sum_${factor}x_sec":$mSumN%.3f,"sum_ratio":${mSumN / mSum1}%.2f,"resolve_ratio":${rN / r1}%.2f,${spillJson(imN, idN, ipN)}}""")
      spark.stop()
      return
    }

    if (!storeOnly) {
      val rows = Heavy.map { name =>
        val t1 = time(name, sfDir)
        val tN = time(name, big)
        val ratio = tN / t1
        println(f"""{"query":"$name","sec_1x":$t1%.3f,"sec_${factor}x":$tN%.3f,"ratio":$ratio%.2f}""")
        (name, t1, tN, ratio)
      }
      val worst = rows.maxBy(_._4)
      val sum1 = rows.map(_._2).sum; val sumN = rows.map(_._3).sum
      println(f"""{"metric":"scale_stress","factor":$factor,"sum_1x_sec":$sum1%.3f,"sum_${factor}x_sec":$sumN%.3f,"sum_ratio":${sumN / sum1}%.2f,"worst":"${worst._1}","worst_ratio":${worst._4}%.2f}""")
    }

    // store family: time the full ingest (base + value/rate/quant
    // cascades) at both scales into fresh work dirs, then the declared
    // store reads (fixture builds pre-warmed untimed so the first read
    // doesn't absorb an ingest)
    def timeIngest(dir: String, tgt: String): (Double, Long, Long, Long) = {
      drain(); metrics.reset()
      val t0 = System.nanoTime()
      graft.sources.TsdbStore.ingest(spark, Tables.events(spark, dir), tgt)
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      (sec, metrics.memSpill, metrics.diskSpill, metrics.peakExecMem)
    }
    def spillJson(m: Long, d: Long, p: Long): String =
      s""""spill_mem_mb":${m >> 20},"spill_disk_mb":${d >> 20},"peak_task_mem_mb":${p >> 20}"""
    val (ing1, m1, d1, p1) = timeIngest(sfDir, s"$work/store_1x")
    val (ingN, mN, dN, pN) = timeIngest(big, s"$work/store_${factor}x")
    println(f"""{"query":"store_ingest","sec_1x":$ing1%.3f,"sec_${factor}x":$ingN%.3f,"ratio":${ingN / ing1}%.2f,${spillJson(mN, dN, pN)}}""")
    graft.sources.StoreFixture.store(spark, sfDir)
    graft.sources.StoreFixture.store(spark, big)
    val storeRows = Store.map { name =>
      val t1 = time(name, sfDir)
      val (tN, qm, qd, qp) = timed(name, big)
      println(f"""{"query":"$name","sec_1x":$t1%.3f,"sec_${factor}x":$tN%.3f,"ratio":${tN / t1}%.2f,${spillJson(qm, qd, qp)}}""")
      (name, t1, tN, tN / t1)
    }
    val sSum1 = ing1 + storeRows.map(_._2).sum
    val sSumN = ingN + storeRows.map(_._3).sum
    println(f"""{"metric":"scale_stress_store","factor":$factor,"sum_1x_sec":$sSum1%.3f,"sum_${factor}x_sec":$sSumN%.3f,"sum_ratio":${sSumN / sSum1}%.2f,${spillJson(mN, dN, pN)}}""")
    spark.stop()
  }

  /** Replicate documents / embeddings / events `factor`× into `out`
    * with the per-replica decorrelating transforms described above.
    * Replica 0 is the original corpus unchanged. `eventsOnly` skips
    * the text/embedding tables for store-mode runs (they aren't read,
    * and their Caesar transform caps the factor at 26). */
  def buildCorpus(spark: SparkSession, sfDir: String, out: String,
                  factor: Int, eventsOnly: Boolean = false): Unit = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def shifted(s: String, k: Int): String = s.drop(k) + s.take(k)

    if (!eventsOnly) {
      val docs = Tables.documents(spark, sfDir)
      (0 until factor).map { k =>
        docs.select(
          (col("doc_id") + lit(k * 100000000L)).as("doc_id"),
          (if (k == 0) col("text")
           else translate(col("text"), lower + upper,
             shifted(lower, k) + shifted(upper, k))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

      val emb = Tables.embeddings(spark, sfDir)
      (0 until factor).map { k =>
        emb.select(
          (col("vec_id") + lit(k * 100000000L)).as("vec_id"),
          (if (k == 0) col("embedding")
           else expr(s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
             s"slice(embedding, 1, $k))")).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    }

    // events: read raw (nanos-as-long shim like Tables.events) so the
    // written file round-trips through the same loader branch
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until factor).map { k =>
      ev.withColumn("user_id", col("user_id") + lit(k * 1000000L))
        .withColumn("event_id", col("event_id") + lit(k * 1000000000000L))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
  }

  /** `mode = long` corpus: the SAME series keys, `factor`× the samples
    * per series — replica k shifts every timestamp by k·(span + 1 s) so
    * the replicas concatenate into one long history per series; only
    * event_id offsets (uniqueness). Handles both testdata physical
    * shapes (raw int64 nanos via the nanosAsLong shim, and tz-naive µs
    * timestamps), writing back the same shape it read. */
  def buildLongCorpus(spark: SparkSession, sfDir: String, out: String,
                      factor: Int): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val isRawNanos =
      ev.schema("ts").dataType == org.apache.spark.sql.types.LongType
    val replicas =
      if (isRawNanos) {
        val mm = ev.agg(min("ts"), max("ts")).head()
        val spanNs = mm.getLong(1) - mm.getLong(0) + 1000000000L
        (0 until factor).map { k =>
          ev.withColumn("ts", col("ts") + lit(k * spanNs))
            .withColumn("event_id", col("event_id") + lit(k * 1000000000000L))
        }
      } else {
        val mm = ev.select(unix_micros(min("ts")), unix_micros(max("ts"))).head()
        val spanUs = mm.getLong(1) - mm.getLong(0) + 1000000L
        (0 until factor).map { k =>
          ev.withColumn("ts", timestamp_micros(unix_micros(col("ts")) + lit(k * spanUs)))
            .withColumn("event_id", col("event_id") + lit(k * 1000000000000L))
        }
      }
    replicas.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
  }
}
