package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch — mergeable frequency estimation. Complements
  * [[MisraGries]]: MG keeps the identities of heavy items but its
  * counter values depend on merge order (only the bound is canonical);
  * count-min answers point frequency queries for ANY item and its
  * merge is a cell-wise SUM — an exact commutative monoid, so the
  * sketch (and every estimate) is bit-identical under any partial-
  * aggregation schedule, safe to declare on the rows-only surface.
  *
  * Guarantees (pinned in CountMinSpec): estimates never undercount;
  * overcount ≤ 2n/Width with probability ≥ 1 − 2^−Depth per query
  * (standard Markov bound per row, min over independent rows).
  * Depth×Width = 4×2048 longs = 64 KB per sketch.
  */
object CountMin {
  val Depth = 4
  val Width = 2048

  def emptyCells: Array[Long] = new Array[Long](Depth * Width)

  /** Row-r bucket for hash h: splitmix64 remix of (h, r). */
  @inline private def bucket(h: Long, r: Int): Int = {
    val z = SplitMix64.mix(h + r.toLong * 0x9E3779B97F4B7C15L)
    (((z % Width) + Width) % Width).toInt
  }

  def add(cells: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < Depth) { cells(r * Width + bucket(h, r)) += 1L; r += 1 }
    cells
  }

  /** Cell-wise sum (mutates + returns left) — exact, order-free. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def estimate(cells: Array[Long], h: Long): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val c = cells(r * Width + bucket(h, r))
      if (c < est) est = c
      r += 1
    }
    est
  }
}

/** `agg(countMin(xxhash64(col)))` → 64 KB cell array. */
class CountMinBuild extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = CountMin.emptyCells
  override def reduce(b: Array[Long], h: Long): Array[Long] = CountMin.add(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = CountMin.merge(a, b)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
