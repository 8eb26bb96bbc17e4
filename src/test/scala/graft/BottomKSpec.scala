package graft

import org.apache.spark.sql.functions._

import graft.functions.{BottomKQuantile, BottomKSample}

/** Bottom-k priority sample: semilattice laws, partitioning
  * invariance, cap, and quantile accuracy within the O(1/√K) rank
  * bound — all on deterministic splitmix-derived data. */
class BottomKSpec extends SparkSpec {

  private val N = 10000

  /** value(i) ∈ [0,1): a splitmix double, so the population is
    * uniform and exact quantiles are computable in-test. */
  private def valueOf(i: Long): Double =
    (graft.functions.SplitMix64.mix(i) >>> 11) * 1.1102230246251565e-16

  test("semilattice laws at the buffer level: idempotent, commutative, capped") {
    val items = (0L until 2000L).map(i =>
      (graft.functions.SplitMix64.mix(i + 77), valueOf(i)))
    val a = items.take(1200).foldLeft(BottomKSample.empty) {
      case (b, (p, v)) => BottomKSample.add(b, p, v) }
    val b = items.drop(1200).foldLeft(BottomKSample.empty) {
      case (acc, (p, v)) => BottomKSample.add(acc, p, v) }
    val ab = BottomKSample.merge(a, b)
    val ba = BottomKSample.merge(b, a)
    assert(ab.pri.toSeq == ba.pri.toSeq && ab.value.toSeq == ba.value.toSeq,
      "merge not commutative")
    val aa = BottomKSample.merge(a, a)
    assert(aa.pri.toSeq == a.pri.toSeq && aa.value.toSeq == a.value.toSeq,
      "merge not idempotent")
    assert(ab.pri.length == BottomKSample.K, "cap not enforced")
    assert(ab.pri.toSeq == ab.pri.toSeq.sorted, "buffer lost its order")
    // the merged sample IS the bottom-K of the union
    val expect = items.sortBy(x => (x._1, x._2)).take(BottomKSample.K)
    assert(ab.pri.toSeq == expect.map(_._1), "not the K smallest priorities")
  }

  test("sample is partitioning-invariant and quantiles sit within the rank bound") {
    import spark.implicits._
    val df = spark.range(N)
      .select(col("id"), xxhash64(col("id")).as("pri"))
      .withColumn("value", expr(
        // top-53-bits-of-hash double: uniform on [0,1), so population
        // quantiles are the identity (q-quantile ≈ q). Hashed from a
        // SHIFTED id: a value derived from the same hash as the
        // priority would make the "random" sample the bottom-k of the
        // values themselves
        "cast(shiftrightunsigned(xxhash64(id + 987654321), 11) as double) * 1.1102230246251565e-16"))
    val bk = udaf(new BottomKQuantile)
    def sample(d: org.apache.spark.sql.DataFrame): Seq[Double] =
      d.agg(bk(col("pri"), col("value"))).as[Seq[Double]].head()
    val s1 = sample(df)
    val s2 = sample(df.repartition(13))
    assert(s1 == s2, "sample depends on input partitioning")
    assert(s1.length == BottomKSample.K)
    assert(s1 == s1.sorted, "finish() must value-sort the sample")
    // uniform population: quantile of the sample ≈ quantile of the
    // population with rank s.e. √(p(1−p)/K) ≈ 0.022 at p=0.5 — assert
    // a ~4σ corridor (deterministic data, so this is a fixed number)
    val p50 = BottomKSample.quantile(s1.toArray, 0.5)
    val p95 = BottomKSample.quantile(s1.toArray, 0.95)
    assert(math.abs(p50 - 0.5) < 0.09, s"p50 estimate $p50 too far from 0.5")
    assert(math.abs(p95 - 0.95) < 0.06, s"p95 estimate $p95 too far from 0.95")
    // small groups: sample == population, quantiles exact
    val tiny = spark.range(7)
      .select(col("id"), xxhash64(col("id")).as("pri"),
        (col("id") * 10).cast("double").as("value"))
    val st = tiny.agg(bk(col("pri"), col("value"))).as[Seq[Double]].head()
    assert(st == Seq(0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0))
    assert(BottomKSample.quantile(st.toArray, 0.5) == 30.0)
  }

  test("A-ES weighted sample: equals brute force bit-for-bit, weights skew it") {
    import spark.implicits._
    // two weight classes, equal counts: w=10 for even ids, w=1 for odd
    val df = spark.range(N)
      .select(col("id"),
        when(col("id") % 2 === 0, 10.0).otherwise(1.0).as("w"))
      .withColumn("race", expr(
        """-ln((cast(shiftrightunsigned(xxhash64(id), 11) as double) + 0.5)
          |  * 1.1102230246251565e-16) / w""".stripMargin))
    val ws = udaf(new graft.functions.WeightedSampleIds)
    def sample(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(ws(col("race"), col("id"))).as[Seq[Long]].head()
    val s1 = sample(df)
    assert(s1 == sample(df.repartition(11)), "sample depends on partitioning")
    assert(s1.length == BottomKSample.K)
    assert(s1.distinct.length == s1.length, "without-replacement violated")
    // brute-force driver recompute with the IDENTICAL expressions (same
    // JVM libm for ln, same hash) — race order must match bit-for-bit
    val race = df.select("id", "race").as[(Long, Double)].collect()
    val expect = race.sortBy { case (id, r) =>
      (java.lang.Double.doubleToLongBits(r), id.toDouble) }
      .take(BottomKSample.K).map(_._1).toSeq
    assert(s1 == expect, "sample is not the k smallest race times")
    // A-ES inclusion: P(i sampled) rises with w_i — with a 512-of-10000
    // sample and 10:1 weights, the heavy class must dominate strongly
    // (expected ~90% heavy; deterministic data makes this a fixed count)
    val heavy = s1.count(_ % 2 == 0)
    assert(heavy >= (s1.length * 3) / 4, s"only $heavy/${s1.length} heavy ids")
  }
}
