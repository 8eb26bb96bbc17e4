package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** wrap_delta: the counter-wrap rule as a native Catalyst expression —
  * checked through SQL (codegen path) and against the reference
  * semantics `if delta < 0 then delta + cap`. */
class WrapDeltaSpec extends SparkSpec {

  test("wrap_delta registered via extensions, codegen path") {
    import spark.implicits._
    val df = Seq((10L, 3L), (3L, 10L), (999999L, 5L)).toDF("prev", "cur")
    val out = df.selectExpr("wrap_delta(prev, cur, 1000000L) AS d")
      .as[Long].collect().toSeq
    // 3-10 wraps: 3-10+1e6 = 999993; 10-3 = 7; 5-999999 wraps to 6
    assert(out == Seq(999993L, 7L, 6L))
  }

  test("null propagation (first sample of a series has no prev)") {
    import spark.implicits._
    val df = Seq((Option.empty[Long], 5L)).toDF("prev", "cur")
    val out = df.selectExpr("wrap_delta(prev, cur, 1000000L) AS d").collect()
    assert(out.head.isNullAt(0))
  }

  test("property: TimeWeightedMean merge is grouping-invariant (partial-agg determinism)") {
    import graft.functions.{TimeWeightedMean, WSum}
    val agg = new TimeWeightedMean
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 100000L), Gen.chooseNum(1L, 10000000L)))
    val prop = Prop.forAll(gen, Gen.chooseNum(1, 39)) { (xs, cut) =>
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = xs.splitAt(cut % (xs.size.max(1)))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged == whole && (xs.isEmpty || agg.finish(merged) == agg.finish(whole))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("property: result in [0, cap) and mod-consistent with plain delta") {
    val cap = 1000000L
    val inRange = Gen.chooseNum(0L, cap - 1)
    val prop = Prop.forAll(inRange, inRange) { (prev: Long, cur: Long) =>
      val d = ((cur - prev) % cap + cap) % cap
      val expected = if (cur - prev < 0) cur - prev + cap else cur - prev
      d >= 0 && d < cap && d == expected
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
