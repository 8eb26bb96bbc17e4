package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hll, HllBuild, HllMergeEstimate}

/** Mergeable-HLL laws: union is a bounded join-semilattice (assoc,
  * comm, idempotent), sketches are partitioning-invariant, a cascaded
  * merge equals the flat build EXACTLY, and the estimate sits inside
  * the advertised error bound. */
class HllSpec extends SparkSpec {

  private def randRegs(seed: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(Hll.M)(r.nextInt(30).toByte)
  }

  test("union laws: associative, commutative, idempotent") {
    for (seed <- 1 to 20) {
      val (a, b, c) = (randRegs(seed), randRegs(seed + 100), randRegs(seed + 200))
      def u(x: Array[Byte], y: Array[Byte]) = Hll.union(x.clone(), y.clone())
      assert(u(u(a, b), c).sameElements(u(a, u(b, c))), s"assoc failed @$seed")
      assert(u(a, b).sameElements(u(b, a)), s"comm failed @$seed")
      assert(u(a, a).sameElements(a), s"idem failed @$seed")
    }
  }

  test("estimate within 3*rsd of exact distinct") {
    val rnd = new scala.util.Random(42)
    val n = 50000
    val regs = Hll.emptyRegs
    val values = Array.fill(n)(rnd.nextLong())
    values.foreach(v => Hll.add(regs, v))
    val exact = values.distinct.length
    val est = Hll.estimate(regs)
    val rsd = 1.04 / math.sqrt(Hll.M.toDouble)
    assert(math.abs(est - exact) <= 3 * rsd * exact,
      s"estimate $est vs exact $exact outside 3*rsd")
  }

  test("cascaded per-day merge equals flat build exactly") {
    import spark.implicits._
    val build = udaf(new HllBuild)
    val merge = udaf(new HllMergeEstimate)
    val hashed = Tables.events(spark, Sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        xxhash64(col("user_id")).as("h"))
    val cascaded = hashed
      .groupBy("event_type", "day").agg(build(col("h")).as("sketch"))
      .groupBy("event_type").agg(merge(col("sketch")).as("est"))
    val flat = hashed
      .groupBy("event_type").agg(build(col("h")).as("sketch"))
      .select(col("event_type"),
        udf((s: Array[Byte]) => Hll.estimate(s)).apply(col("sketch")).as("est"))
    val c = cascaded.orderBy("event_type").as[(String, Long)].collect()
    val f = flat.orderBy("event_type").as[(String, Long)].collect()
    assert(c.sameElements(f), s"cascade $c != flat $f — merge is not lossless")
    // and the estimates are honest: within 3*rsd of the exact distinct
    val exact = Tables.events(spark, Sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .orderBy("event_type").as[(String, Long)].collect().toMap
    val rsd = 1.04 / math.sqrt(Hll.M.toDouble)
    c.foreach { case (et, est) =>
      assert(math.abs(est - exact(et)) <= 3 * rsd * exact(et) + 1,
        s"$et: est $est vs exact ${exact(et)}") }
  }

  test("sketch is partitioning-invariant (partial-agg determinism)") {
    import spark.implicits._
    val build = udaf(new HllBuild)
    def estimateWith(parts: Int): Array[(String, Long)] = {
      Tables.events(spark, Sf)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .repartition(parts)
        .groupBy("event_type").agg(build(col("h")).as("sketch"))
        .select(col("event_type"),
          udf((s: Array[Byte]) => Hll.estimate(s)).apply(col("sketch")).as("est"))
        .orderBy("event_type").as[(String, Long)].collect()
    }
    assert(estimateWith(1).sameElements(estimateWith(13)),
      "estimate depends on the partitioning")
  }
}
