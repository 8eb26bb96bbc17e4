package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bloom, BloomBuild}

/** Bloom-filter laws: zero false negatives, false-positive rate inside
  * the analytic bound, OR-union semilattice, partitioning invariance. */
class BloomSpec extends SparkSpec {

  test("no false negatives; fp rate within the analytic bound") {
    val rnd = new scala.util.Random(5)
    val members = Array.fill(8000)(rnd.nextLong()).distinct
    val memberSet = members.toSet
    val bits = Bloom.emptyBits
    members.foreach(Bloom.add(bits, _))
    members.foreach(m => assert(Bloom.mightContain(bits, m), "false negative"))
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(memberSet)
    val fp = probes.count(Bloom.mightContain(bits, _)).toDouble / probes.length
    val bound = math.pow(
      1 - math.exp(-Bloom.NumHashes.toDouble * members.length / Bloom.NumBits),
      Bloom.NumHashes)
    assert(fp <= 2 * bound + 0.005, s"fp rate $fp exceeds 2x analytic bound $bound")
  }

  test("union is associative, commutative, idempotent") {
    def sk(seed: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val b = Bloom.emptyBits
      (0 until 500).foreach(_ => Bloom.add(b, rnd.nextLong()))
      b
    }
    val (a, b, c) = (sk(1), sk(2), sk(3))
    def u(x: Array[Byte], y: Array[Byte]) = Bloom.union(x.clone(), y.clone())
    assert(u(u(a, b), c).sameElements(u(a, u(b, c))))
    assert(u(a, b).sameElements(u(b, a)))
    assert(u(a, a).sameElements(a))
  }

  test("sketch is partitioning-invariant; split-and-union equals flat") {
    val build = udaf(new BloomBuild)
    def sketchWith(parts: Int): Array[Byte] =
      Tables.events(spark, Sf)
        .select(xxhash64(col("user_id")).as("h"))
        .repartition(parts)
        .agg(build(col("h"))).head().getAs[Array[Byte]](0)
    assert(sketchWith(1).sameElements(sketchWith(13)),
      "sketch depends on partitioning")
    // day-split sketches OR together to exactly the flat sketch
    val daily = Tables.events(spark, Sf)
      .select(to_date(col("ts")).as("day"), xxhash64(col("user_id")).as("h"))
      .groupBy("day").agg(build(col("h")).as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    val merged = daily.foldLeft(Bloom.emptyBits)(Bloom.union)
    assert(merged.sameElements(sketchWith(1)), "daily union != flat build")
  }
}
