package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity building blocks (SURVEY.md §2 J, vector half).
  *
  * Determinism: every float is widened to double FIRST, products are
  * taken in index order, and the sum is a sequential left fold
  * (`aggregate`), matching DuckDB's `list_reduce` evaluation order
  * bit for bit. No BLAS, no reassociation.
  *
  * Scale: brute-force top-k is the correctness baseline (O(n²·d) —
  * fine to ~10⁴ vectors when one side is broadcast). The scale path is
  * [[lshBucketCosine]]: sign-random-projection buckets cut candidate
  * pairs to matching buckets only, trading recall for a ~bucket-count
  * speedup; both paths share the same scoring expression.
  */
object VectorOps {

  /** Cast a float array column to double. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double-array columns — the
    * native codegen [[graft.functions.DotProduct]] expression (same
    * index-order left fold as the `zip_with`+`aggregate` HOF and
    * DuckDB's `list_reduce`, ~6× faster on the all-pairs stage). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** vec_id + v (double) + nrm, from an embeddings table. */
  def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** All-pairs cosine with the small side broadcast; `cond` restricts
    * the pair space (a≠b for top-k, a<b for near-dup). */
  def cosinePairs(emb: DataFrame, cond: (Column, Column) => Column): DataFrame = {
    val n = normalized(emb)
    val a = n.toDF("a_id", "av", "anrm")
    val b = n.toDF("b_id", "bv", "bnrm")
    a.join(broadcast(b), cond(col("a_id"), col("b_id")))
      .withColumn("sim", round(dot(col("av"), col("bv")) / col("anrm") / col("bnrm"), 4))
  }

  /** Exactly Spark's `round(x, 4)` on DoubleType: decimal HALF_UP over
    * the shortest-repr string (BigDecimal.valueOf). Keeping this
    * bit-identical lets the tight-loop kernels below share oracles
    * with the expression-based formulation. */
  private[graft] def round4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else {
      // fast path: scale-and-floor agrees with the decimal-string
      // HALF_UP result except within ~1e-9 of a half boundary (covers
      // both the *1e4 multiply error and the shortest-repr half-ulp);
      // near-boundary values take the exact BigDecimal path (rare)
      val y = x * 1e4
      val f = Math.floor(y)
      val frac = y - f
      if (Math.abs(frac - 0.5) < 1e-9)
        java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      else if (frac > 0.5) (f + 1) / 1e4
      else f / 1e4
    }

  /** Id-sorted corpus (id, vec, norm) for broadcasting to the scoring
    * loops — the same collect-and-broadcast a broadcast hash join does,
    * valid while one side fits on the driver (~10⁵ × dim doubles);
    * beyond that the LSH/IVF paths are the answer. */
  private def collectCorpus(emb: DataFrame): Array[(Long, Array[Double], Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    normalized(emb).select("vec_id", "v", "nrm")
      .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
  }

  /** Index-order sequential-fold dot — the same evaluation order as
    * [[dot]] (and DuckDB's list_reduce), so results are bit-identical. */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Brute-force exact cosine top-k, tight-loop form: corpus broadcast
    * once, each partition scores its queries against primitive arrays
    * (no per-pair row materialization — ~5× over the nested-loop-join
    * formulation at 10⁴ vectors, same bits). Ties broken by lower
    * b_id, matching `ORDER BY sim DESC, b_id`. */
  def cosineTopK(emb: DataFrame, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectCorpus(emb))
    normalized(emb).select("vec_id", "v", "nrm")
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (aid, av, anrm) =>
          val topSim = new Array[Double](k)
          val topId = new Array[Long](k)
          var size = 0
          var ci = 0
          while (ci < cs.length) {
            val (bid, bv, bnrm) = cs(ci)
            if (bid != aid) {
              val s = round4(dotSeq(av, bv) / anrm / bnrm)
              // insertion position: strictly-greater sim displaces;
              // equal sim keeps the earlier (lower) id first
              var pos = size
              while (pos > 0 && s > topSim(pos - 1)) pos -= 1
              if (pos < k) {
                val last = math.min(size, k - 1)
                var j = last
                while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
                topSim(pos) = s; topId(pos) = bid
                if (size < k) size += 1
              }
            }
            ci += 1
          }
          (0 until size).map(i => (aid, (i + 1).toLong, topId(i), topSim(i)))
        }
      }.toDF("a_id", "rn", "b_id", "sim")
  }

  /** All near-dup pairs (a_id < b_id) with cosine ≥ minSim — the
    * tight-loop twin of `cosinePairs(...).filter(sim >= t)`. */
  def cosineThresholdPairs(emb: DataFrame, minSim: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectCorpus(emb))
    normalized(emb).select("vec_id", "v", "nrm")
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (aid, av, anrm) =>
          // corpus is id-sorted: binary-search the first id > aid
          var lo = 0; var hi = cs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cs(mid)._1 <= aid) lo = mid + 1 else hi = mid
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var ci = lo
          while (ci < cs.length) {
            val (bid, bv, bnrm) = cs(ci)
            val s = round4(dotSeq(av, bv) / anrm / bnrm)
            if (s >= minSim) out += ((aid, bid, s))
            ci += 1
          }
          out
        }
      }.toDF("a_id", "b_id", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a codegen-friendly integer hash mapped to [-0.5, 0.5). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(hash(lit(plane) * 1000003 + dim * 7919), lit(1000000)).cast("double")
      / lit(1000000.0)) - lit(0.5)

  /** Sign-random-projection (SimHash-style) bucket id over `nPlanes`
    * deterministic hyperplanes — the LSH prefilter for cosine ANN. */
  def srpBucket(v: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(1), size(v)), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** ANN via IVF (inverted-file) partitioning: k-means centroids
    * (spark.ml, fixed seed) assign each vector to its nearest cell;
    * each query probes its `nprobe` nearest cells, so scoring touches
    * ~nprobe/k of the corpus. The coarse quantizer is tiny (k
    * centroids, broadcast); the candidate join is an equi-join on
    * cell id — the IVF structure a vector store would persist. */
  /** Driver-side Lloyd's k-means over a capped sample — the standard
    * IVF training recipe (FAISS does the same): centroid quality needs
    * ~100s of points per cell, not the full corpus, so the fit is O(1)
    * in corpus size and runs as tight loops on the driver instead of
    * ~k×iter tiny Spark jobs. Deterministic: id-ordered sample,
    * evenly-spaced seeding, fixed iteration count. */
  private def trainCentroids(sample: Array[Array[Double]], k: Int,
                             iters: Int = 10): Array[Array[Double]] = {
    val n = sample.length
    val dim = sample.head.length
    val cents = Array.tabulate(k)(c => sample(((c.toLong * n) / k).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var i = 0
      while (i < n) {
        val v = sample(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          val cv = cents(c)
          while (j < dim) { val t = v(j) - cv(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var j = 0
        while (j < dim) { s(j) += v(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  def ivfCosine(emb: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val n = normalized(emb)
    // capped deterministic sample (id-ordered modulus, not .sample():
    // reproducible across partitionings) — fit cost is O(1) in corpus
    // size; at 100 TB this is the difference vs 10 full k-means passes
    val total = n.count()
    val cap = math.max(k * 256L, 2048L)
    val every = math.max(1L, total / cap)
    val sample = n.filter(pmod(col("vec_id"), lit(every)) === 0)
      .select("v").as[Array[Double]].collect()
    val cents = trainCentroids(sample, k).zipWithIndex
    val centDf = spark.createDataFrame(
        cents.map { case (c, i) => (i, c) }.toSeq).toDF("cell", "cv")
    // nprobe nearest cells per vector by exact centroid distance —
    // centroids broadcast, assignment is a shuffle-free tight loop
    // (the crossJoin+window formulation costs two extra stages)
    val bcCents = spark.sparkContext.broadcast(cents.map { case (c, i) => (i, c) })
    val probed = n.select("vec_id", "v", "nrm")
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val cs = bcCents.value
        it.flatMap { case (id, v, nrm) =>
          val d2 = cs.map { case (ci, cv) =>
            var d = 0.0; var j = 0
            while (j < v.length) { val t = v(j) - cv(j); d += t * t; j += 1 }
            (d, ci)
          }
          // ties by cell id asc, matching the old ORDER BY d2, cell
          d2.sortBy(identity).take(nprobe).map { case (_, ci) => (id, v, nrm, ci) }
        }
      }.toDF("vec_id", "v", "nrm", "cell")
    val a = probed.toDF("a_id", "av", "anrm", "cell")
    val b = probed.toDF("b_id", "bv", "bnrm", "cell")
    // inverted lists (b side) broadcast: a shuffle join on k cell keys
    // caps parallelism at k and is skew-prone; real IVF streams the
    // inverted list past each query — broadcast is that, Spark-shaped
    a.join(broadcast(b), Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", round(dot(col("av"), col("bv")) / col("anrm") / col("bnrm"), 4))
      .select("a_id", "b_id", "cell", "sim")
    // candidate MULTISET: a pair sharing two probed cells appears once
    // per cell (the cell column tells which); deduplicating here would
    // shuffle the full candidate set for no semantic gain — consumers
    // that need unique pairs group by (a_id, b_id) downstream
  }

  /** ANN via LSH buckets: cosine scored only within matching buckets.
    * Recall < 1 by design; verified against brute force in ScalaTest. */
  def lshBucketCosine(emb: DataFrame, nPlanes: Int): DataFrame = {
    val n = normalized(emb).withColumn("bucket", srpBucket(col("v"), nPlanes))
    val a = n.toDF("a_id", "av", "anrm", "bucket")
    val b = n.toDF("b_id", "bv", "bnrm", "bucket")
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", round(dot(col("av"), col("bv")) / col("anrm") / col("bnrm"), 4))
      .select("a_id", "b_id", "bucket", "sim")
  }
}
