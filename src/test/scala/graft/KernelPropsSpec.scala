package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{TopKByValue, TopKEntry}
import graft.operators.VectorOps

/** Properties guarding the correctness-critical kernel tricks: the
  * fast HALF_UP rounding must equal Spark's BigDecimal semantics on
  * every input (the oracle parity of the cosine kernels depends on
  * it), and the bounded-heap top-k must merge lawfully in any order
  * (partial aggregation combines buffers in arbitrary order). */
class KernelPropsSpec extends AnyFunSuite {

  private def checked(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p).passed)

  private def roundRef(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("property: round4 fast path == BigDecimal HALF_UP") {
    checked(Prop.forAll(Gen.chooseNum(-1.0, 1.0)) { x: Double =>
      VectorOps.round4(x) == roundRef(x)
    })
    checked(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { x: Double =>
      VectorOps.round4(x) == roundRef(x)
    })
    // adversarial half-boundary neighborhood: k/20000 ± one ulp
    (-40000 to 40000 by 7).foreach { k =>
      val base = k / 20000.0
      Seq(base, Math.nextUp(base), Math.nextDown(base)).foreach { x =>
        assert(VectorOps.round4(x) == roundRef(x), s"x=$x")
      }
    }
  }

  test("property: TopKByValue merge order never changes the result") {
    val agg = new TopKByValue(3)
    val entryGen = for {
      id <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(-10.0, 10.0)
      rounded <- Gen.oneOf(true, false) // duplicate sims hit the tiebreak
    } yield TopKEntry(id, if (rounded) math.rint(v) else v)
    checked(Prop.forAll(Gen.listOf(entryGen), Gen.chooseNum(0, 97)) {
      (es: List[TopKEntry], seed: Int) =>
        val sequential = es.foldLeft(agg.zero)(agg.reduce)
        val cut = if (es.isEmpty) 0 else (seed * 31 + 7) % (es.length + 1)
        val (a, b) = es.splitAt(cut)
        val bufA = a.foldLeft(agg.zero)(agg.reduce)
        val bufB = b.foldLeft(agg.zero)(agg.reduce)
        agg.merge(bufA, bufB) == sequential &&
          agg.merge(bufB, bufA) == sequential
    })
  }
}
