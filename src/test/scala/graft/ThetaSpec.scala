package graft

import org.apache.spark.sql.functions._

import graft.functions.{BottomKSample, ThetaSketch, ThetaSketchAgg}

/** Theta/KMV set-expression sketch: exactness below K, error bound
  * above K, inclusion–exclusion identity, distinct-feed idempotence,
  * and partitioning invariance of the distributed build. */
class ThetaSpec extends SparkSpec {

  private def buildLocal(ids: Seq[Long]): Array[Long] = {
    val buf = ids.foldLeft(BottomKSample.empty) { (b, id) =>
      BottomKSample.addDistinct(b,
        ThetaSketch.hash63(graft.functions.SplitMix64.mix(id)), 0.0)
    }
    buf.pri
  }

  test("exact mode below K: every set expression equals the true count") {
    // two overlapping small sets: A = [0, 300), B = [200, 450)
    val a = buildLocal(0L until 300L)
    val b = buildLocal(200L until 450L)
    assert(a.length == 300 && b.length == 250, "distinct add not set-semantics")
    assert(ThetaSketch.estimate(a) == 300.0 && ThetaSketch.estimate(b) == 250.0)
    val (u, i, ab, ba) = ThetaSketch.pairEstimates(a, b)
    assert(u == 450.0, s"union $u != 450")
    assert(i == 100.0, s"inter $i != 100")
    assert(ab == 200.0 && ba == 150.0, s"diffs $ab/$ba != 200/150")
  }

  test("distinct-feed idempotence: re-feeding elements never changes the sketch") {
    val once = buildLocal(0L until 2000L)
    val thrice = buildLocal((0L until 2000L) ++ (0L until 2000L) ++ (500L until 1500L))
    assert(once.toSeq == thrice.toSeq, "duplicate feeds changed the sketch")
    assert(once.length == ThetaSketch.K, "cap not enforced")
  }

  test("estimates above K sit within the KMV error bound, and " +
      "inclusion-exclusion holds exactly") {
    // |A| = 40000, |B| = 30000, |A∩B| = 10000
    val a = buildLocal(0L until 40000L)
    val b = buildLocal(30000L until 60000L)
    // RSE ≈ 1/√(K−2) ≈ 4.4% at K=512; allow 4 sigma
    def within(est: Double, truth: Double, sigmas: Double = 4.0): Unit =
      assert(math.abs(est - truth) <= sigmas * truth / math.sqrt(ThetaSketch.K - 2.0),
        s"estimate $est too far from $truth")
    within(ThetaSketch.estimate(a), 40000.0)
    within(ThetaSketch.estimate(b), 30000.0)
    val (u, i, ab, ba) = ThetaSketch.pairEstimates(a, b)
    within(u, 60000.0)
    within(i, 10000.0, 8.0)  // intersection RSE scales with union/inter ratio
    within(ab, 30000.0)
    within(ba, 20000.0, 6.0)
    // the estimator is a single 1/θ scaling of trimmed-sample counts,
    // so union + inter == estA' + estB' up to fp association
    assert(math.abs((u + i) - ((i + ab) + (i + ba))) <= 1e-9 * (u + i),
      "inclusion-exclusion violated")
  }

  test("window merges of stored daily sketches equal a direct build (cascade pattern)") {
    // simulate 10 daily sketches over overlapping user populations
    val daily = (0 until 10).map { day =>
      buildLocal((day * 500L) until (day * 500L + 2000L))
    }
    // trailing-3-day window via merge of finished sketches
    val merged = ThetaSketch.mergeArrays(daily.slice(5, 8))
    // direct build from the same raw ids — must be bit-identical: the
    // stored form loses nothing the semilattice needs
    val direct = buildLocal(
      ((5 * 500L) until (5 * 500L + 2000L)) ++
      ((6 * 500L) until (6 * 500L + 2000L)) ++
      ((7 * 500L) until (7 * 500L + 2000L)))
    assert(merged.toSeq == direct.toSeq,
      "merged daily sketches differ from the direct build")
    // estimate vs exact distinct (ids 2500..5499 = 3000 distinct)
    val est = ThetaSketch.estimate(merged)
    assert(math.abs(est - 3000.0) <=
      4 * 3000.0 / math.sqrt(ThetaSketch.K - 2.0), s"estimate $est far from 3000")
  }

  test("distributed build is partitioning-invariant and matches the local fold") {
    import spark.implicits._
    val th = udaf(new ThetaSketchAgg)
    def sketchOf(parts: Int): Array[Long] =
      spark.range(25000)
        .repartition(parts, expr(s"id % $parts"))
        .select((xxhash64(col("id")).bitwiseAND(lit(Long.MaxValue))).as("h63"))
        .agg(th(col("h63")).as("sk"))
        .as[Array[Long]].head()
    val s4 = sketchOf(4)
    val s13 = sketchOf(13)
    assert(s4.toSeq == s13.toSeq, "sketch depends on partitioning")
    // same elements through the local reduce path
    val local = (0L until 25000L).foldLeft(BottomKSample.empty) { (b, id) =>
      BottomKSample.addDistinct(b, ThetaSketch.hash63(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          id, org.apache.spark.sql.types.LongType, 42L)), 0.0)
    }.pri
    assert(s4.toSeq == local.toSeq, "distributed != local fold")
  }
}
