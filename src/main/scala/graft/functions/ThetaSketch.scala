package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Theta / KMV distinct sketch with SET-EXPRESSION estimates — the
  * member of the mergeable-sketch family (HLL, Bloom, count-min,
  * Misra-Gries, bottom-k) that answers |A∪B|, |A∩B|, |A\B| over
  * distinct keys, which HLL alone cannot (HLL unions but never
  * intersects) [pub: Beyer et al. 2007 KMV; the theta-sketch framework,
  * Dasgupta et al. 2016 / Apache DataSketches].
  *
  * Representation: the K smallest DISTINCT 63-bit hashes of the set's
  * elements, riding the proven [[BottomKSample]] semilattice (value
  * field pinned to 0.0, so buffer equality is hash-set equality). The
  * K-th smallest hash, normalized by 2⁶³, is the threshold θ — the
  * sketch is a uniform sample of the element universe at rate θ, so
  * |A| ≈ (K−1)/θ, and any set expression over two sketches is estimated
  * by trimming both to θ = min(θ_A, θ_B) and counting sample hashes:
  * est = |expr(S_A, S_B)| / θ. Under K distinct elements the sketch IS
  * the hash set and every estimate is exact.
  *
  * Determinism: hashes are xxhash64 of the key — the sketch, hence
  * every estimate, is a pure function of the input SET (bit-identical
  * under any partitioning/merge schedule; idempotent under re-feeds of
  * the same element). 100 TB shape: same as bottom-k — partial reduce
  * keeps ≤K pairs per (group × partition), the final shuffle carries
  * ≈8 KB per group, estimates are O(K) driver- or row-side arithmetic
  * on two tiny arrays.
  */
object ThetaSketch {
  val K: Int = BottomKSample.K
  private val Pow63 = math.pow(2.0, 63)

  /** 63-bit hash domain: drop the sign bit so signed Long order equals
    * the order of the uniform [0, 2⁶³) hash values. */
  def hash63(h: Long): Long = h & Long.MaxValue

  /** θ in (0, 1]: 1 when the sketch holds fewer than K hashes (exact
    * mode), else the K-th smallest hash normalized to (0,1). */
  def theta(pris: Array[Long]): Double =
    if (pris.length < K) 1.0 else pris(K - 1).toDouble / Pow63

  /** Distinct-count estimate: exact below K, else (K−1)/θ. */
  def estimate(pris: Array[Long]): Double =
    if (pris.length < K) pris.length.toDouble
    else (K - 1).toDouble / theta(pris)

  /** Set-union merge of finished sketches (sorted hash arrays) — the
    * semilattice join lifted to the serialized form, so PRE-BUILT
    * sketches (e.g. one per day, stored like a cascade level) answer
    * any window/rollup by merging without rescanning raw rows. */
  def mergeArrays(sketches: Seq[Array[Long]]): Array[Long] = {
    var acc = BottomKSample.empty
    sketches.foreach { s =>
      acc = BottomKSample.merge(acc,
        BottomKSample.Buf(s, new Array[Double](s.length)))
    }
    acc.pri
  }

  /** (|A∪B|, |A∩B|, |A\B|, |B\A|) estimates from two sorted hash
    * arrays. Both are trimmed to the common threshold (strictly below
    * the smaller K-th hash; everything when both sketches are exact),
    * then one two-pointer pass counts the intersection — the estimator
    * satisfies inclusion–exclusion exactly: union + inter = |A'| + |B'|
    * scaled by the same 1/θ. */
  def pairEstimates(a: Array[Long], b: Array[Long]): (Double, Double, Double, Double) = {
    val thRaw =
      math.min(if (a.length < K) Long.MaxValue else a(K - 1),
               if (b.length < K) Long.MaxValue else b(K - 1))
    val th = if (thRaw == Long.MaxValue) 1.0 else thRaw.toDouble / Pow63
    var na = a.length; while (na > 0 && a(na - 1) >= thRaw && thRaw != Long.MaxValue) na -= 1
    var nb = b.length; while (nb > 0 && b(nb - 1) >= thRaw && thRaw != Long.MaxValue) nb -= 1
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = na + nb - inter
    (union / th, inter / th, (na - inter) / th, (nb - inter) / th)
  }
}

/** `agg(udaf(new ThetaSketchAgg)(hash63Col))` → the sketch's sorted
  * hash array (ascending), ready for [[ThetaSketch]] arithmetic. Input
  * must already be in the 63-bit domain ([[ThetaSketch.hash63]]). */
class ThetaSketchAgg extends Aggregator[Long, BottomKSample.Buf, Array[Long]] {
  override def zero: BottomKSample.Buf = BottomKSample.empty
  override def reduce(b: BottomKSample.Buf, h: Long): BottomKSample.Buf =
    BottomKSample.addDistinct(b, h, 0.0)
  override def merge(a: BottomKSample.Buf, b: BottomKSample.Buf): BottomKSample.Buf =
    BottomKSample.merge(a, b)
  override def finish(r: BottomKSample.Buf): Array[Long] = r.pri
  override def bufferEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
