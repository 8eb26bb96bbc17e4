package graft

import graft.operators.TimeSeriesOps

/** Pins the chunked-associative Holt smoother
  * (TimeSeriesOps.holtChunked) against the plain sequential fold — the
  * EmaSpec regime one dimension up: the (level, trend) recurrence runs
  * as per-chunk folds of (2×2 matrix, 2-vector) affine pairs plus an
  * in-order combine, and this spec proves the matrix algebra (chunk
  * slicing, seed handling, composition order) the same two ways:
  *  - α = β = 0.5 over small integers and short series: every matrix
  *    entry and intermediate is an exactly-representable dyadic
  *    rational (each step multiplies by halves/quarters — ~2 mantissa
  *    bits per step, so n ≤ 20 stays far inside 53 bits), so chunked
  *    must equal sequential BIT-FOR-BIT at every chunk size;
  *  - α = 0.2, β = 0.1 over 10⁵ varied samples: regrouped double
  *    arithmetic, agreement pinned to 1e-9 relative (q_ts_holt's
  *    DuckDB oracle hash at round(…,4) is the cross-engine gate).
  */
class HoltSpec extends SparkSpec {

  private def seqHolt(vs: Seq[Double], a: Double, b: Double): (Double, Double) =
    vs.tail.foldLeft((vs.head, 0.0)) { case ((l, t), x) =>
      val l2 = a * x + (1 - a) * (l + t)
      val t2 = b * (l2 - l) + (1 - b) * t
      (l2, t2)
    }

  private def chunked(rows: Seq[(Long, String, Long, Long, Double)],
                      a: Double, b: Double, chunkSize: Int,
                      nPartitions: Int = 0): Map[(Long, String), (Long, Double, Double)] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type", "ts_us", "event_id", "v")
    TimeSeriesOps.holtChunked(
        if (nPartitions > 0) df.repartition(nPartitions) else df,
        a, b, chunkSize)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
  }

  test("dyadic inputs: chunked == sequential bit-for-bit across chunk sizes") {
    // α = β = 0.5 makes M = [[.5, .5], [−.25, .75]] and c = (.5, .25) —
    // all dyadic; any algebra slip (wrong seed vector, off-by-one chunk
    // slice, transposed or out-of-order matrix product) changes bits
    val rng = new scala.util.Random(42)
    val n = 20
    val vs = Seq.fill(n)(rng.nextInt(15).toDouble + 1.0)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      (1L, "s", 1704067200000000L + i * 1000000L, i.toLong, v)
    }
    val (el, et) = seqHolt(vs, 0.5, 0.5)
    for (cs <- Seq(2, 3, 7, 16)) {
      val (cnt, l, t) = chunked(rows, 0.5, 0.5, cs)((1L, "s"))
      assert(cnt == n)
      assert(l == el, s"chunkSize=$cs level: $l != $el")
      assert(t == et, s"chunkSize=$cs trend: $t != $et")
    }
  }

  test("alpha=0.2 beta=0.1 on 1e5 samples: chunked tracks sequential to 1e-9") {
    val rng = new scala.util.Random(7)
    val n = 100000
    val vs = Seq.fill(n)(rng.nextDouble() * 100000.0)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      (2L, "big", 1704067200000000L + i * 1000000L, i.toLong, v)
    }
    val (el, et) = seqHolt(vs, 0.2, 0.1)
    val (cnt, l, t) = chunked(rows, 0.2, 0.1, 4096)((2L, "big"))
    assert(cnt == n)
    assert(math.abs(l - el) / math.abs(el) < 1e-9, s"level $l vs $el")
    // the trend is a small difference of large smoothed values — give
    // it the same RELATIVE slack against the level's magnitude
    assert(math.abs(t - et) / math.abs(el) < 1e-9, s"trend $t vs $et")
    // partitioning-INVARIANCE, bit-for-bit: chunk membership is
    // row_number over the series order and each chunk's rows are
    // sort_array'd, so 1/4/32 input partitions must yield the SAME
    // doubles — a regression that leans on collect_list arrival order
    // (no sort_array) changes bits here
    for (p <- Seq(1, 4, 32)) {
      val (cp, lp, tp) = chunked(rows, 0.2, 0.1, 4096, nPartitions = p)((2L, "big"))
      assert(cp == n)
      assert(lp == l && tp == t,
        s"partitions=$p: ($lp, $tp) != ($l, $t) — result depends on partitioning")
    }
  }

  test("multi-series, short series, and single-sample series") {
    // n=1 (pure seed: level = x₁, trend = 0), n < chunkSize, n spanning
    // several chunks — one frame so cross-series chunk isolation holds
    val mk = (uid: Long, n: Int) => (0 until n).map(i =>
      (uid, "e", 1704067200000000L + i * 1000000L, i.toLong, (i % 13 + 1).toDouble))
    val rows = mk(1L, 1) ++ mk(2L, 5) ++ mk(3L, 1000)
    val out = chunked(rows, 0.5, 0.5, 256)
    for ((uid, n) <- Seq((1L, 1), (2L, 5), (3L, 1000))) {
      val vs = mk(uid, n).map(_._5)
      val (cnt, l, t) = out((uid, "e"))
      assert(cnt == n.toLong)
      val (el, et) = seqHolt(vs, 0.5, 0.5)
      if (n <= 20) { assert(l == el, s"series $uid level"); assert(t == et, s"series $uid trend") }
      else {
        assert(math.abs(l - el) / math.abs(el) < 1e-12, s"series $uid level")
        assert(math.abs(t - et) / math.abs(el) < 1e-12, s"series $uid trend")
      }
    }
  }
}
