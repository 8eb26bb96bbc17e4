package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k priority sample — mergeable QUANTILE estimation, the
  * missing member of the sketch family: HLL (distinct), Bloom
  * (membership), count-min (frequency), Misra-Gries (heavy hitters),
  * bottom-k (quantiles). Each row carries a deterministic pseudo-random
  * PRIORITY (splitmix64 of its unique id); the sketch keeps the K rows
  * of smallest priority. Bottom-k of a union is the k-smallest of the
  * merged sets — an idempotent commutative SEMILATTICE, so the sample
  * (hence every quantile read) is bit-identical under any partial-agg
  * schedule or input partitioning, like the HLL register-max and unlike
  * order-sensitive reservoir sampling. The kept values are a uniform
  * size-K sample of the population [pub: bottom-k / order sampling,
  * Cohen & Kaplan 2007; Rosén 1997], so nearest-rank quantiles off the
  * sample converge at O(1/√K) rank error — BottomKSpec pins the
  * invariances exactly and the accuracy within the statistical bound.
  *
  * 100 TB shape: per-partition partial reduce keeps ≤K pairs, the final
  * shuffle carries K×16 B ≈ 8 KB per group — the same map-side-combined
  * class as sum(). The exact rank-select quantiles (q_agg_median_exact,
  * q_ts_p95_billing) stay the bit-exact tools; this is the one-pass
  * mergeable estimate for when a full sort per group is too expensive.
  */
object BottomKSample {
  val K = 512

  /** Sorted-by-(priority, value) parallel arrays; size ≤ K. Priorities
    * are splitmix64 mixes of unique ids, so cross-row ties are
    * vanishingly rare — the value tie-break keeps even that case
    * deterministic. */
  case class Buf(pri: Array[Long], value: Array[Double])

  def empty: Buf = Buf(new Array[Long](0), new Array[Double](0))

  @inline private def lt(p1: Long, v1: Double, p2: Long, v2: Double): Boolean =
    p1 < p2 || (p1 == p2 && java.lang.Double.compare(v1, v2) < 0)

  /** Insert one (priority, value), keeping the K smallest. O(K) shift
    * on accept; rejects in O(1) once the buffer is full and the
    * priority is above the current max. */
  def add(b: Buf, p: Long, v: Double): Buf = {
    val n = b.pri.length
    if (n == K && !lt(p, v, b.pri(n - 1), b.value(n - 1))) return b
    // binary search by (pri, value) for the insertion point
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(b.pri(mid), b.value(mid), p, v)) lo = mid + 1 else hi = mid
    }
    val m = math.min(n + 1, K)
    val np = new Array[Long](m); val nv = new Array[Double](m)
    System.arraycopy(b.pri, 0, np, 0, lo)
    System.arraycopy(b.value, 0, nv, 0, lo)
    np(lo) = p; nv(lo) = v
    val tail = m - lo - 1
    if (tail > 0) {
      System.arraycopy(b.pri, lo, np, lo + 1, tail)
      System.arraycopy(b.value, lo, nv, lo + 1, tail)
    }
    Buf(np, nv)
  }

  /** Set-semantics insert: like [[add]] but a (priority, value) pair
    * already present is left alone — the reduce-side twin of the
    * merge's equal-pair collapse. This is what turns the bottom-k
    * buffer into a KMV/theta DISTINCT sketch: feeding the same element
    * (same hash) any number of times yields the same buffer. */
  def addDistinct(b: Buf, p: Long, v: Double): Buf = {
    val n = b.pri.length
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(b.pri(mid), b.value(mid), p, v)) lo = mid + 1 else hi = mid
    }
    if (lo < n && b.pri(lo) == p &&
      java.lang.Double.compare(b.value(lo), v) == 0) b
    else add(b, p, v)
  }

  /** Two-pointer SET-union merge keeping the K smallest — the
    * semilattice join: commutative, associative, and idempotent. Equal
    * (priority, value) pairs collapse to one (that is what makes
    * merge(a, a) == a exactly); across disjoint data this only fires on
    * a 2⁻⁶⁴-rare priority collision of equal values, where dropping the
    * twin costs one sample slot, not correctness. */
  def merge(a: Buf, b: Buf): Buf = {
    val cap = math.min(a.pri.length + b.pri.length, K)
    val np = new Array[Long](cap); val nv = new Array[Double](cap)
    var i = 0; var j = 0; var o = 0
    while (o < cap && (i < a.pri.length || j < b.pri.length)) {
      if (j >= b.pri.length) { np(o) = a.pri(i); nv(o) = a.value(i); i += 1 }
      else if (i >= a.pri.length) { np(o) = b.pri(j); nv(o) = b.value(j); j += 1 }
      else if (a.pri(i) == b.pri(j) &&
          java.lang.Double.compare(a.value(i), b.value(j)) == 0) {
        np(o) = a.pri(i); nv(o) = a.value(i); i += 1; j += 1
      }
      else if (lt(a.pri(i), a.value(i), b.pri(j), b.value(j))) {
        np(o) = a.pri(i); nv(o) = a.value(i); i += 1
      }
      else { np(o) = b.pri(j); nv(o) = b.value(j); j += 1 }
      o += 1
    }
    if (o == cap) Buf(np, nv)
    else Buf(java.util.Arrays.copyOf(np, o), java.util.Arrays.copyOf(nv, o))
  }

  /** Nearest-rank quantile off the sample's value order (the same
    * ceil(q·n) rank convention as q_ts_p95_billing). NaN when empty. */
  def quantile(values: Array[Double], q: Double): Double = {
    if (values.isEmpty) return Double.NaN
    val s = values.clone()
    java.util.Arrays.sort(s)
    val rank = math.max(1, math.ceil(q * s.length).toInt)
    s(math.min(rank, s.length) - 1)
  }
}

/** Weighted sample WITHOUT replacement (A-ES [pub: Efraimidis &
  * Spirakis 2006, "Weighted random sampling with a reservoir"]): item i
  * gets the exponential race time e_i = −ln(u_i)/w_i from a
  * DETERMINISTIC uniform u_i (hash of the row id, shifted off zero);
  * the k smallest e_i are exactly a weighted k-sample without
  * replacement. POSITIVE doubles order identically to their raw IEEE-754
  * bits read as signed longs, so e_i rides the proven [[BottomKSample]]
  * semilattice unchanged — same idempotent set-union merge, same
  * ≤K-pairs-per-(group × partition) partial-agg shape. The buffer keeps
  * the full K=512 race leaders, which serves ANY k ≤ K: the first k of
  * the priority-ordered finish IS the A-ES k-sample (bottom-k of
  * bottom-K = bottom-k). Input (e_i, id); finish returns ids in race
  * order (winner first). Requires e_i > 0 finite — guaranteed by any
  * u ∈ (0,1), w > 0. */
class WeightedSampleIds extends Aggregator[(Double, Long), BottomKSample.Buf, Array[Long]] {
  override def zero: BottomKSample.Buf = BottomKSample.empty
  // priority = raw bits of the positive race time (order-preserving);
  // value = the id (exact in a double for ids < 2^53)
  override def reduce(b: BottomKSample.Buf, x: (Double, Long)): BottomKSample.Buf =
    BottomKSample.add(b, java.lang.Double.doubleToLongBits(x._1), x._2.toDouble)
  override def merge(a: BottomKSample.Buf, b: BottomKSample.Buf): BottomKSample.Buf =
    BottomKSample.merge(a, b)
  override def finish(r: BottomKSample.Buf): Array[Long] =
    r.value.map(_.toLong)
  override def bufferEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** The STORED form of the quantile sketch — finish returns the raw
  * (priority, value) buffer itself so it can persist as two parallel
  * array columns and be re-merged later. This is what the store's
  * `quant_<step>` cascade materializes per (series, slot): because the
  * bottom-k buffer is a semilattice, merging STORED per-slot sketches
  * is bit-identical to sketching the union of the raw rows — the
  * materialization is transparent to every later read, at any scale
  * (QuantCascadeSpec pins the equality). */
class BottomKState extends Aggregator[(Long, Double), BottomKSample.Buf, BottomKSample.Buf] {
  override def zero: BottomKSample.Buf = BottomKSample.empty
  override def reduce(b: BottomKSample.Buf, x: (Long, Double)): BottomKSample.Buf =
    BottomKSample.add(b, x._1, x._2)
  override def merge(a: BottomKSample.Buf, b: BottomKSample.Buf): BottomKSample.Buf =
    BottomKSample.merge(a, b)
  override def finish(r: BottomKSample.Buf): BottomKSample.Buf = r
  override def bufferEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
  override def outputEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
}

/** Re-merge STORED sketches (the struct<pri, value> column written by
  * [[BottomKState]]) — the cascade-build and fetch-side re-aggregation:
  * coarser `quant_<step>` levels merge the finer level's sketches, and
  * [[graft.sources.TsdbStore.fetchQuantile]] merges the scanned level
  * up to the requested slot. Same semilattice, so level never matters. */
class BottomKMergeState extends Aggregator[BottomKSample.Buf, BottomKSample.Buf, BottomKSample.Buf] {
  override def zero: BottomKSample.Buf = BottomKSample.empty
  override def reduce(b: BottomKSample.Buf, x: BottomKSample.Buf): BottomKSample.Buf =
    BottomKSample.merge(b, x)
  override def merge(a: BottomKSample.Buf, b: BottomKSample.Buf): BottomKSample.Buf =
    BottomKSample.merge(a, b)
  override def finish(r: BottomKSample.Buf): BottomKSample.Buf = r
  override def bufferEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
  override def outputEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
}

/** `agg(new BottomKQuantile().toColumn)` over (priority, value) rows →
  * the sample's values, VALUE-sorted ascending (quantile-ready). */
class BottomKQuantile extends Aggregator[(Long, Double), BottomKSample.Buf, Array[Double]] {
  override def zero: BottomKSample.Buf = BottomKSample.empty
  override def reduce(b: BottomKSample.Buf, x: (Long, Double)): BottomKSample.Buf =
    BottomKSample.add(b, x._1, x._2)
  override def merge(a: BottomKSample.Buf, b: BottomKSample.Buf): BottomKSample.Buf =
    BottomKSample.merge(a, b)
  override def finish(r: BottomKSample.Buf): Array[Double] = {
    val s = r.value.clone()
    java.util.Arrays.sort(s)
    s
  }
  override def bufferEncoder: Encoder[BottomKSample.Buf] =
    ExpressionEncoder[BottomKSample.Buf]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
