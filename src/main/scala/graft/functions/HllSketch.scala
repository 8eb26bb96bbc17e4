package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog sketch — the cascade-compatible approximate
  * distinct the reference's aggregate-of-aggregate story implies [pub:
  * tsdb/aggregator.py coarse-from-fine cascade — unverified, SURVEY.md
  * §0] and a training-data pipeline needs (distinct users/docs per day
  * rolled up to any coarser period WITHOUT re-touching raw data).
  *
  * `approx_count_distinct` gives a one-shot estimate; what it cannot do
  * is persist a per-day sketch and union it later. These Aggregators
  * split the two halves:
  *
  *  - [[HllBuild]]:  values → serialized register array (a sketch you
  *    can store next to the day's other aggregates)
  *  - [[HllMergeEstimate]]: sketches → union → estimate
  *
  * Registers: p=12 → 4096 bytes/sketch, rsd ≈ 1.04/√4096 ≈ 1.6%.
  * Union is element-wise max — associative, commutative, idempotent —
  * so sketches built under ANY partitioning/day-split merge to exactly
  * the sketch of the union, and a cascaded estimate equals the flat
  * one bit for bit (HllSpec pins all of this). Inputs must already be
  * 64-bit hashes (use `xxhash64(...)` in the projection) so the
  * aggregation itself stays pure integer work.
  */
object Hll {
  val P = 12
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1 + 1.079 / M)

  def emptyRegs: Array[Byte] = new Array[Byte](M)

  /** Fold one 64-bit hash into the registers (mutates + returns). */
  def add(regs: Array[Byte], h: Long): Array[Byte] = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0L) 64 - P + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
    regs
  }

  /** Element-wise max union (mutates + returns the left buffer). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M,
      s"HLL sketch must be $M bytes, got ${a.length}/${b.length}")
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Standard HLL estimator with linear-counting small-range
    * correction; 64-bit hashes need no large-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / sum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else e
    math.round(corrected)
  }
}

/** `agg(hllBuild(xxhash64(col)))` → serialized sketch per group. */
class HllBuild extends Aggregator[Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Hll.emptyRegs
  override def reduce(b: Array[Byte], h: Long): Array[Byte] = Hll.add(b, h)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.union(a, b)
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `agg(hllMerge(sketchCol))` → union of stored sketches → estimate. */
class HllMergeEstimate extends Aggregator[Array[Byte], Array[Byte], Long] {
  override def zero: Array[Byte] = Hll.emptyRegs
  override def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = Hll.union(b, s)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.union(a, b)
  override def finish(r: Array[Byte]): Long = Hll.estimate(r)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
