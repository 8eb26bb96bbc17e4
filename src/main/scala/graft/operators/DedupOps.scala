package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale (SURVEY.md §2 J): MinHash-LSH and
  * SimHash. Both are banded so candidate generation is an EQUI-join on
  * (band, bucket) — the only formulation that survives 100 TB: the
  * all-pairs comparison space never materializes, only hash-bucket
  * collisions do. Hash functions are Spark's xxhash64 (deterministic,
  * codegen'd) — no oracle parity is possible (DuckDB hashes differ),
  * so correctness is ScalaTest: planted near-dups must be recovered.
  */
object DedupOps {

  /** k min-hashes per doc over its shingle set: h_i = min over shingles
    * of xxhash64(i, shingle). One shuffle (groupBy doc_id); the k mins
    * fold map-side. */
  def minHashSignatures(shingles: DataFrame, k: Int): DataFrame =
    shingles.groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("sh"))).as("h0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i")): _*)

  /** LSH banding: k signatures split into `bands` bands of k/bands rows;
    * band bucket = hash of its rows. Docs sharing any band bucket are
    * candidate pairs (Jaccard ≳ (1/bands)^(bands/k) threshold curve). */
  def minHashCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sig = minHashSignatures(TextOps.shingles(docs, 3), k)
    // one (band, bucket) row per band via posexplode of an array of
    // the band-bucket hashes (round 17): ONE generator pass over the
    // signature aggregate instead of a `bands`-way unionByName — the
    // union branches mostly dedup at runtime (they re-read the reused
    // signature exchange) but still each pay a read+project per band
    // per join side; the generator pays one. Same (doc_id, band,
    // bucket) rows, same candidates (guide §2.3/§2.4).
    val bandBuckets = array((0 until bands).map { b =>
      xxhash64((b * rows until (b + 1) * rows).map(i => col(s"h$i")): _*)
    }: _*)
    // no persist: the signature aggregate ends in an exchange, which
    // the self-join's two sides REUSE at runtime (AQE stage reuse) — a
    // cache here measured strictly slower (columnar serialization tax)
    val banded = sig.select(col("doc_id"),
        posexplode(bandBuckets).as(Seq("band", "bucket")))
    val a = banded.toDF("a_id", "band", "bucket")
    val b = banded.toDF("b_id", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** 64-bit SimHash over the token bag: bit j of the signature is the
    * sign of Σ_tokens (±1 depending on bit j of the token hash).
    *
    * Computed as a typed per-partition pass — one tight 64-counter
    * loop per document, no token explode, no 64-column shuffle. This
    * is the legitimate `mapPartitions` case (SURVEY.md §7.2): per-row
    * imperative accumulation that no built-in expression shape covers
    * efficiently. Narrow ⇒ embarrassingly parallel at 100 TB. */
  def simHashSignatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val counts = new Array[Int](64)
          text.split(' ').foreach { w =>
            // two independent 32-bit murmurs → a stable 64-bit hash
            val h = (scala.util.hashing.MurmurHash3.stringHash(w, 0xA5F1).toLong << 32) |
              (scala.util.hashing.MurmurHash3.stringHash(w, 0x9E37).toLong & 0xFFFFFFFFL)
            var j = 0
            while (j < 64) {
              if (((h >>> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
              j += 1
            }
          }
          var sig = 0L
          var j = 0
          while (j < 64) { if (counts(j) >= 0) sig |= (1L << j); j += 1 }
          (id, sig)
        }
      }.toDF("doc_id", "simhash")
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, banded
    * into `chunks` equal bit-chunks: distance ≤ chunks-1 ⇒ some chunk
    * is equal (pigeonhole), so candidates come from an equi-join and
    * the exact popcount filter runs only on collisions. More chunks =
    * guaranteed recall at higher distance but denser buckets — tune
    * per corpus scale. NOTE: recall is EXACT only for
    * maxDist <= chunks-1; beyond that the banded join may miss pairs
    * (callers wanting a larger exact radius must raise `chunks`). */
  def simHashCandidates(docs: DataFrame, maxDist: Int = 7, chunks: Int = 8): DataFrame = {
    require(chunks > 0 && 64 % chunks == 0, s"chunks must divide 64: $chunks")
    val width = 64 / chunks
    val mask = (1L << width) - 1
    val sig = simHashSignatures(docs)
    // (round 17 note: a posexplode single-pass banding — 2 signature
    // evaluations instead of 2×chunks — was tried and REVERTED: the
    // documents scan is one input split at bench scale, so the
    // single-pass form runs the whole mapPartitions signature loop in
    // ONE task while the union's per-chunk branches spread the
    // redundant passes across chunks× tasks; wall-clock favored the
    // union on every A/B. At CPU-saturated scale the trade flips, but
    // there the scan has real split parallelism and the signature pass
    // is a vanishing fraction of the banded join.)
    val banded = (0 until chunks).map { c =>
      sig.select(col("doc_id"), col("simhash"), lit(c).as("chunk"),
        shiftrightunsigned(col("simhash"), c * width).bitwiseAND(lit(mask)).as("key"))
    }.reduce(_ unionByName _)
    val a = banded.toDF("a_id", "a_sig", "chunk", "key")
    val b = banded.toDF("b_id", "b_sig", "chunk", "key")
    a.join(b, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .filter(col("hamming") <= maxDist) // filter BEFORE the dedup
      .distinct()                        // shuffle so only survivors shuffle
  }

  /** Connected components over an undirected edge list (a_id, b_id) —
    * the dedup-cluster resolution step: every near-dup pair family
    * (exact, MinHash, SimHash, embedding) yields PAIRS; keeping one
    * representative per transitive group needs components.
    *
    * Min-label propagation to fixpoint: each node takes the minimum
    * label in its closed neighborhood each round, so cluster id =
    * smallest doc_id in the component — a deterministic fixpoint
    * independent of execution order. Rounds ≈ graph diameter (dedup
    * clusters are shallow; ≤ `maxIters` guards pathological chains).
    * Each round is one join + one map-side-combined min agg — the
    * alternating-star CC recipe specialises to this when components
    * are small, and nothing driver-side ever holds the graph.
    *
    * Convergence is CHECKED, not assumed: a component whose diameter
    * exceeds `maxIters` would otherwise silently keep stale labels —
    * the loop throws instead (raise `maxIters` for long-chain graphs;
    * dedup clusters are shallow so the default is generous).
    *
    * @param nodes one column `node`; includes singletons (cluster = self)
    * @param edges columns `a_id`, `b_id`
    * @param reliableCheckpoint checkpoint each round to the cluster
    *   checkpoint dir (survives executor loss — the right choice for a
    *   long 1000-executor run) instead of executor-local blocks, which
    *   are lost with their executor. On a cluster the session MUST have
    *   a cluster-visible checkpoint dir set — a driver-local temp dir
    *   would silently void the survives-executor-loss guarantee, so
    *   the temp-dir fallback is allowed only under a local master
    *   (ADVICE r4). Session conf `spark.graft.reliableCheckpoint=true`
    *   forces this path for every invocation (round 14 — the
    *   executor-kill harness flips declared queries to it).
    * Precondition: every edge endpoint must appear in `nodes`
    * (edges ⊆ nodes × nodes) — both code paths assume it, and the
    * driver fast path diverges from the loop when violated (ADVICE
    * r17; see the in-body note).
    * @return (node, cluster) */
  /** Edge-count gate for the driver union-find fast path: ≤ this many
    * surviving near-dup edges (two longs each — ~3 MB at the cap, the
    * same bounded-driver-read class as the ANN training sample) resolve
    * on the driver in one pass; past it, the distributed label loop
    * runs. Dedup edge sets are threshold-filtered SURVIVORS — tiny next
    * to the corpus — so at bench scale the fast path replaces
    * ~2×diameter tiny shuffle jobs with one collect; at 100 TB a
    * web-corpus edge set blows the cap and takes the loop. */
  val DriverEdgeCap = 200000L

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIters: Int = 20,
                          reliableCheckpoint: Boolean = false,
                          driverEdgeCap: Long = DriverEdgeCap): DataFrame = {
    val spark = nodes.sparkSession
    // session-wide escape hatch (round 14, ADVICE r13 #1): declared
    // queries call CC with the default, so a harness that SIGKILLs
    // executors mid-iteration (ChaosVerify) — where executor-local
    // localCheckpoint blocks are unrecoverable and the job aborts
    // instead of retrying — flips every CC invocation to the
    // cluster-durable path with one conf, no per-query plumbing.
    // The conf ALSO bypasses the driver fast path below, so the chaos
    // arms keep exercising the durable iterative protocol they were
    // built to cover.
    val reliable = reliableCheckpoint ||
      spark.conf.get("spark.graft.reliableCheckpoint", "false").toBoolean
    // bounded-size fast path (round 17): min-label union-find over the
    // collected edge list — the FIXPOINT is unique (smallest id per
    // component), so this is value-identical to the label-propagation
    // loop by construction (DedupSpec pins equality on a planted graph
    // both above and below the cap). The collect is ≤ cap rows of two
    // longs. Labels re-attach to the node frame as a broadcast join;
    // nodes outside any edge keep cluster = self, exactly as the loop's
    // union-with-own-label does.
    //
    // PRECONDITION (ADVICE r17): fast path ≡ loop only under
    // edges ⊆ nodes × nodes. An edge endpoint absent from `nodes` gets
    // a label row from the fast path but none from the loop (the loop
    // seeds labels from `nodes` alone), and can relabel a real node
    // through a phantom smaller id. Every in-repo caller passes the
    // full id universe as `nodes` (DedupSpec pins fast-path == loop on
    // that contract); a runtime edges⊆nodes check would cost an extra
    // distributed job per call, so the contract is documented here
    // instead of enforced.
    import spark.implicits._
    require(driverEdgeCap >= 0 && driverEdgeCap < Int.MaxValue,
      s"driverEdgeCap must fit an Int limit, got $driverEdgeCap") // ADVICE r17: cap+1 overflow
    // ONE evaluation decides the gate AND feeds the fast path: collect
    // at most cap+1 edges; an overflowing collect falls through to the
    // loop (which re-evaluates edges — at that scale the candidate
    // funnel's survivor cache already holds them). Null-id edges are
    // excluded up front: the loop's equi-joins silently drop them,
    // so the fast path must never see them either (the bare (Long,
    // Long) decode would NPE).
    val es =
      if (reliable) Array.empty[(Long, Long)]
      else edges.select(col("a_id").cast("long"), col("b_id").cast("long"))
        .filter(col("a_id").isNotNull && col("b_id").isNotNull)
        .as[(Long, Long)].limit((driverEdgeCap + 1).toInt).collect()
    if (!reliable && es.length <= driverEdgeCap) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { // union by MIN root ⇒ root == smallest id in component
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = parent.keys.map(x => (x, find(x))).toSeq
      val lblDf =
        if (labels.isEmpty) spark.emptyDataset[(Long, Long)].toDF("node", "lbl")
        else spark.createDataset(labels).toDF("node", "lbl")
      return nodes.join(broadcast(lblDf), Seq("node"), "left")
        .select(col("node"), coalesce(col("lbl"), col("node")).as("cluster"))
    }
    if (reliable && spark.sparkContext.getCheckpointDir.isEmpty) {
      require(spark.sparkContext.isLocal,
        "reliableCheckpoint on a cluster requires an explicit cluster-visible " +
          "checkpoint dir (SparkContext.setCheckpointDir) — a driver-local " +
          "temp dir does not survive executor loss")
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    }
    // LAZY local checkpoint (round 17): every ckpt() call here is
    // followed by exactly one eager consumer (lblSum for the label
    // frames, the first round's join for `und`), so the lineage
    // truncation still happens on the round's first action — but as
    // part of THAT job instead of a separate eager materialization job
    // per round. Halves the per-round job count (2 → 1); the reliable
    // path stays eager — the chaos harness' recovery contract was
    // pinned against it and an extra job per round is noise next to a
    // cluster-durable write.
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(false)
    val und = ckpt(edges.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(edges.select(col("b_id").as("u"), col("a_id").as("v")))
      .distinct())
    // checkpoint each round truncates the logical plan — without it
    // the iteration-nested lineage grows exponentially (the same
    // reason GraphFrames checkpoints its CC loop)
    var labels = ckpt(nodes.select(col("node"), col("node").as("lbl")))
    // labels only ever decrease, so Σlbl strictly decreases until the
    // fixpoint: an unchanged sum IS convergence — one map-side-combined
    // agg over checkpointed data, vs a join-based change detector
    def lblSum(df: org.apache.spark.sql.DataFrame): Long =
      // coalesce: sum over an EMPTY node set is NULL — an empty corpus
      // (e.g. semanticDedup over an empty embeddings table) must
      // converge in one round, not NPE on the null sum
      df.agg(coalesce(sum("lbl"), lit(0L))).head().getLong(0)
    var prevSum = lblSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // neighbour labels (via edges) ∪ own label, then min per node
      val next = ckpt(und.join(labels, und("v") === labels("node"))
        .select(und("u").as("node"), col("lbl"))
        .unionByName(labels)
        .groupBy("node").agg(min("lbl").as("lbl")))
      val nextSum = lblSum(next)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations " +
          "(component diameter exceeds maxIters — raise it)")
    labels.withColumnRenamed("lbl", "cluster")
  }
}
