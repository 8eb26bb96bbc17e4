package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** LSH-bucketed ANN vs brute force: the bucketed path must be a strict
  * subset of all-pairs with IDENTICAL similarity values, and identical
  * vectors (planted dups) must always collide. */
class AnnLshSpec extends SparkSpec {

  private def vectors = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    // 200 is an exact copy of 3; 201 a tiny perturbation of 4
    val planted = Seq(
      (200L, base(3)._2.clone()),
      (201L, base(4)._2.map(x => x + 0.001f)))
    (base ++ planted).toDF("vec_id", "embedding")
  }

  test("identical vectors always share a bucket; sims match brute force") {
    val lsh = VectorOps.lshBucketCosine(vectors, nPlanes = 8)
    val pairs = lsh.select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((3L, 200L)), "exact duplicate missed by LSH")
    assert(pairs((3L, 200L)) == 1.0)
    // every LSH pair must carry the same rounded sim as brute force
    val brute = VectorOps.cosinePairs(vectors, (a, b) => a < b)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.foreach { case (k, v) => assert(brute(k) == v, s"sim mismatch at $k") }
  }

  test("semantic dedup: planted dups collapse to one keeper per cluster") {
    val out = VectorOps.semanticDedup(vectors, kCells = 4, minSim = 0.99)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 32, "corpus size not preserved")
    val byId = rows.map(t => t._1 -> t).toMap
    // identical copy and tiny perturbation each cluster under the
    // original's id (cluster = min id of the component)
    assert(byId(200L)._2 == 3L && !byId(200L)._3, s"got ${byId(200L)}")
    assert(byId(3L)._2 == 3L && byId(3L)._3)
    assert(byId(201L)._2 == 4L && !byId(201L)._3, s"got ${byId(201L)}")
    // exactly one representative per cluster; unrelated vectors stay
    // singleton keepers (random 64-dim cosines never reach 0.99)
    rows.groupBy(_._2).foreach { case (c, g) =>
      assert(g.count(_._3) == 1, s"cluster $c has ${g.count(_._3)} keepers") }
    assert(rows.count(_._3) == 30, "expected 30 clusters for 32 vectors")
  }

  test("semantic dedup is partitioning-invariant (1000-executor contract)") {
    // cluster assignment, pair generation, and component resolution
    // must be pure functions of the data — repartitioning the input
    // arbitrarily cannot change a single cluster label
    val base = VectorOps.semanticDedup(vectors, kCells = 4, minSim = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val repart = VectorOps.semanticDedup(vectors.repartition(7), kCells = 4, minSim = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(base == repart, "semantic dedup depends on input partitioning")
  }

  test("IVF: identical vectors share a cell; sims match brute force") {
    val ivf = VectorOps.ivfCosine(vectors, k = 4, nprobe = 2)
    val pairs = ivf.select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((3L, 200L)), "exact duplicate missed by IVF")
    assert(pairs((3L, 200L)) == 1.0)
    assert(pairs.contains((4L, 201L)), "perturbed near-dup missed by IVF")
    val brute = VectorOps.cosinePairs(vectors, (a, b) => a < b)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.foreach { case (k, v) => assert(brute(k) == v, s"sim mismatch at $k") }
  }

  test("near-identical vector found with high similarity") {
    val lsh = VectorOps.lshBucketCosine(vectors, nPlanes = 8)
      .filter(col("a_id") === 4L && col("b_id") === 201L)
      .select("sim").collect()
    assert(lsh.nonEmpty, "perturbed near-dup missed")
    assert(lsh.head.getDouble(0) > 0.999)
  }

  test("IVF top-k: high recall vs brute force, identical sims, dup found") {
    val brute = VectorOps.cosineTopK(vectors, 5)
      .select("a_id", "rn", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val ivf = VectorOps.ivfTopK(vectors, kCells = 4, nprobe = 2, k = 5)
      .select("a_id", "rn", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    // every returned (a, b) pair carries the exact brute-force sim
    // (checked against ALL pairs — an unprobed true neighbor may be
    // replaced by a lesser candidate, which is the recall trade-off,
    // but the sim arithmetic must match bit for bit)
    val allSims = VectorOps.cosinePairs(vectors, (a, b) => a =!= b)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { case (k, v) => assert(allSims(k) == v, s"sim mismatch at $k") }
    // planted exact duplicate is each other's top neighbor
    assert(ivf.contains((3L, 200L)) && ivf((3L, 200L)) == 1.0)
    assert(ivf.contains((200L, 3L)) && ivf((200L, 3L)) == 1.0)
    // recall@5 against brute force — probing half the cells must keep
    // a solid majority of true neighbors on this corpus
    val recall = brute.keys.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.6, s"recall@5 = $recall too low")
  }

  test("IVF-PQ: scores are exactly the ADC of the codes, dup found, recall holds") {
    import spark.implicits._
    val pq = VectorOps.ivfPqTopK(vectors, kCells = 4, nprobe = 2, k = 5,
      m = 8, kSub = 16)
    val rows = pq.select("a_id", "b_id", "sim_adc").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every ADC score is a cosine on the quantized sphere: bounded
    assert(rows.values.forall(s => s >= -1.01 && s <= 1.01),
      "sim_adc outside the cosine range — not scoring unit vectors")
    // rebuild the (deterministic) model and recompute every returned
    // score from the candidate's CODE alone — bit-for-bit: the engine
    // never consulted the raw corpus vector after encoding
    val n = VectorOps.unitized(vectors)
    val Some((cents, books)) = VectorOps.pqModel(n, kCells = 4, m = 8, kSub = 16)
    val vecs = n.select("vec_id", "v").as[(Long, Array[Double])].collect().toMap
    val enc = vecs.map { case (id, v) => id -> VectorOps.pqEncode(cents, books, v) }
    rows.foreach { case ((a, b), s) =>
      val (cell, code) = enc(b)
      val expect = VectorOps.round4(VectorOps.pqScore(cents, books, vecs(a), cell, code))
      assert(s == expect, s"ADC mismatch at ($a,$b): $s vs $expect")
    }
    // the planted exact copy encodes identically to its original (same
    // home cell, same codes) and must surface in the original's list
    assert(enc(3L)._1 == enc(200L)._1 &&
      java.util.Arrays.equals(enc(3L)._2, enc(200L)._2),
      "identical vectors encoded differently")
    assert(rows.contains((3L, 200L)), "exact duplicate missed by IVF-PQ")
    // recall@5 vs brute force: quantized ranking may swap near-ties, so
    // the bar sits below ivfTopK's, but a solid majority must survive
    val brute = VectorOps.cosineTopK(vectors, 5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count { case (a, b) => rows.contains((a, b)) }.toDouble / brute.size
    assert(recall >= 0.5, s"recall@5 = $recall too low")
    // partitioning-invariance: the 1000-executor contract
    val reparted = VectorOps.ivfPqTopK(vectors.repartition(7), kCells = 4,
        nprobe = 2, k = 5, m = 8, kSub = 16)
      .select("a_id", "b_id", "sim_adc").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(reparted == rows, "result depends on input partitioning")
  }

  test("IVF-PQ+R: refined sims are exact brute-force cosines; recall >= plain PQ") {
    val refined = VectorOps.ivfPqRefineTopK(vectors, kCells = 4, nprobe = 2,
        k = 5, rerank = 12, m = 8, kSub = 16)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the re-score abandons the quantized space entirely: every
    // reported sim must be the exact all-pairs cosine, bit for bit
    val allSims = VectorOps.cosinePairs(vectors, (a, b) => a =!= b)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    refined.foreach { case (k, v) => assert(allSims(k) == v, s"sim mismatch at $k") }
    // planted exact duplicate surfaces with sim exactly 1.0
    assert(refined.contains((3L, 200L)) && refined((3L, 200L)) == 1.0)
    assert(refined.contains((200L, 3L)) && refined((200L, 3L)) == 1.0)
    // re-ranking can only improve on the ADC ordering: recall@5 vs
    // brute force must be at least the unrefined PQ path's
    val brute = VectorOps.cosineTopK(vectors, 5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = VectorOps.ivfPqTopK(vectors, kCells = 4, nprobe = 2, k = 5,
        m = 8, kSub = 16)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallR = brute.count(refined.contains).toDouble / brute.size
    val recallP = brute.count(plain.contains).toDouble / brute.size
    assert(recallR >= recallP,
      s"refine lowered recall: $recallR < $recallP")
    // partitioning-invariance: the 1000-executor contract
    val reparted = VectorOps.ivfPqRefineTopK(vectors.repartition(7),
        kCells = 4, nprobe = 2, k = 5, rerank = 12, m = 8, kSub = 16)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(reparted == refined, "result depends on input partitioning")
  }

  test("IVF auto-sizing: kCells ≈ √n under the sentinel, explicit wins, search stays exact") {
    // the sizing law itself: √n clamped to [8, 65536], probe ≈ 3% of
    // cells (≥ 2) — this is what keeps IVF candidate work sub-quadratic
    // as the corpus grows (a fixed cell count re-quadratizes it)
    assert(VectorOps.resolveCells(0, 0L) == 8)
    assert(VectorOps.resolveCells(0, 32L) == 8)
    assert(VectorOps.resolveCells(0, 1000000L) == 1000)
    assert(VectorOps.resolveCells(0, Long.MaxValue) == 65536)
    assert(VectorOps.resolveCells(4, 1000000L) == 4, "explicit kCells ignored")
    assert(VectorOps.resolveProbe(0, 8) == 2)
    assert(VectorOps.resolveProbe(0, 1000) == 31)
    assert(VectorOps.resolveProbe(2, 1000) == 2, "explicit nprobe ignored")
    assert(VectorOps.resolveProbe(0, 2) == 2, "nprobe must not exceed kCells")
    // end to end under the sentinel (resolves to 8 cells / 2 probes on
    // this corpus): sims still bit-match brute force, planted dup found
    val auto = VectorOps.ivfTopK(vectors, kCells = 0, nprobe = 0, k = 5)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val allSims = VectorOps.cosinePairs(vectors, (a, b) => a =!= b)
      .select("a_id", "b_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    auto.foreach { case (k, v) => assert(allSims(k) == v, s"sim mismatch at $k") }
    assert(auto.contains((3L, 200L)) && auto((3L, 200L)) == 1.0)
  }

  test("banded LSH spreads a dense bucket across the sub-block grid") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hv = Array.fill(64)(rnd.nextFloat() - 0.5f)
    // 120 exact copies: the worst case LSH exists for — they share every
    // band's bucket, so the unsalted join would score all 7140 pairs in
    // one task
    val hot = (0 until 120).map(i => (1000L + i, hv.clone()))
    val noise = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val corpus = (hot ++ noise).toDF("vec_id", "embedding")

    val subBlocks = 8
    val res = VectorOps.lshBucketCosine(corpus, nPlanes = 8, nBands = 4,
      subBlocks = subBlocks).cache()
    // recall through the grid is untouched: every hot pair survives,
    // each exactly once, with sim 1.0
    val hotPairs = res.filter(col("a_id") >= 1000L && col("b_id") >= 1000L)
    assert(hotPairs.count() == 120L * 119 / 2, "grid dropped or duplicated hot pairs")
    assert(hotPairs.filter(col("sim") =!= 1.0).isEmpty)

    // per-task bound: reproduce the grid keys and check the largest
    // (band, bucket, sub) cell — per-join-key pair space is bounded by
    // maxCell², not the bucket's m²/2
    val sigs = VectorOps.normalized(corpus)
      .select(col("vec_id"), posexplode(array((0 until 4).map(b =>
        VectorOps.srpBucket(col("v"), 8, offset = b * 8)): _*)).as(Seq("band", "bucket")))
      .withColumn("sub", pmod(hash(col("vec_id")), lit(subBlocks)))
    val maxCell = sigs.groupBy("band", "bucket", "sub").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell <= 3L * (120 / subBlocks),
      s"largest grid cell holds $maxCell ids — dense bucket not spread")
  }
}
