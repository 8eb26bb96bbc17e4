package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: exact integer sums — value·weight and weight. */
case class WSum(sumVW: Long, sumW: Long)

/** Time-weighted mean over uneven bins — the reference's
  * aggregate-from-aggregate weighting [pub: tsdb/aggregator.py — the
  * average of a coarse bin weights each fine bin by its covered
  * duration; unverified, SURVEY.md §0] as a typed
  * `Aggregator[IN,BUF,OUT]` UDAF.
  *
  * Input: (cents: BIGINT, weight_us: BIGINT). All accumulation is
  * exact Long arithmetic (order-insensitive ⇒ deterministic under any
  * partial-aggregation schedule); the single double division happens
  * once in `finish`, so the result is reproducible at any parallelism —
  * the property that matters on a 1000-executor aggregation.
  *
  * MAGNITUDE BOUND (made loud in round 12): Σ(cents·weight_us) must
  * fit int64 — since Σweight_us is the series' covered SPAN, the bound
  * is span·|cents|max < 2^63 (a decade of µs ≈ 3.2e14 ⇒ |cents| ≲
  * 2.9e4 per-decade-span series; shorter windows raise it
  * proportionally). JVM Long arithmetic in an Aggregator wraps
  * SILENTLY regardless of spark.sql.ansi.enabled — it never passes
  * through Catalyst — so every step uses Math.addExact/multiplyExact:
  * past the bound the job fails with ArithmeticException instead of
  * returning a plausible wrong mean. */
class TimeWeightedMean extends Aggregator[(Long, Long), WSum, Double] {
  import java.lang.Math.{addExact, multiplyExact}
  override def zero: WSum = WSum(0L, 0L)
  override def reduce(b: WSum, a: (Long, Long)): WSum =
    WSum(addExact(b.sumVW, multiplyExact(a._1, a._2)), addExact(b.sumW, a._2))
  override def merge(b1: WSum, b2: WSum): WSum =
    WSum(addExact(b1.sumVW, b2.sumVW), addExact(b1.sumW, b2.sumW))
  override def finish(r: WSum): Double =
    r.sumVW.toDouble / r.sumW.toDouble / 100.0
  override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
