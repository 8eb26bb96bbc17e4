package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom filter — the join-free membership pre-filter a
  * 100 TB pipeline uses to apply a blocklist/allowlist to a corpus
  * without shuffling it: build the sketch over the (small) key set,
  * broadcast the ~8 KB bit array, and filter the big side with a pure
  * per-row predicate. No false negatives; false-positive rate bounded
  * by the standard (1 - e^{-kn/m})^k, pinned in BloomSpec.
  *
  * Deterministic double hashing from one xxhash64 value (index_i =
  * (h1 + i·h2) mod m), so sketches are partitioning-invariant and
  * union (bitwise OR — associative, commutative, idempotent) composes
  * day-partitioned sketches exactly like [[Hll]].
  */
object Bloom {
  val NumBits: Int = 1 << 16 // 8 KB sketch
  val NumHashes: Int = 6

  def emptyBits: Array[Byte] = new Array[Byte](NumBits / 8)

  @inline private def idx(h1: Long, h2: Long, i: Int): Int =
    (((h1 + i * h2) % NumBits + NumBits) % NumBits).toInt

  /** Fold one 64-bit hash into the bits (mutates + returns). */
  def add(bits: Array[Byte], h: Long): Array[Byte] = {
    val h1 = h
    val h2 = (h >>> 32) | 1L // odd ⇒ full period mod 2^16
    var i = 0
    while (i < NumHashes) {
      val b = idx(h1, h2, i)
      bits(b >> 3) = (bits(b >> 3) | (1 << (b & 7))).toByte
      i += 1
    }
    bits
  }

  def mightContain(bits: Array[Byte], h: Long): Boolean = {
    val h1 = h
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < NumHashes) {
      val b = idx(h1, h2, i)
      if ((bits(b >> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR union (mutates + returns the left buffer). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"bloom size mismatch ${a.length}/${b.length}")
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/** `agg(bloomBuild(xxhash64(col)))` → serialized 8 KB sketch. */
class BloomBuild extends Aggregator[Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Bloom.emptyBits
  override def reduce(b: Array[Byte], h: Long): Array[Byte] = Bloom.add(b, h)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bloom.union(a, b)
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
