package graft

import org.apache.spark.sql.functions._

import graft.functions.{MgSummary, MisraGries}

/** Misra-Gries guarantee under local folds and Spark partial
  * aggregation: estimates in [f - n/(k+1), f], heavy items never
  * missed, bound preserved under any partitioning. */
class MisraGriesSpec extends SparkSpec {

  /** Skewed stream: item "w<i>" appears with frequency 2^(12-i) for
    * i in 0..11, plus a long tail of singletons. */
  private def stream(seed: Int): Seq[String] = {
    val heavy = (0 until 12).flatMap(i => Seq.fill(1 << (12 - i))(s"w$i"))
    val r = new scala.util.Random(seed)
    val tail = (0 until 4000).map(i => s"t${r.nextInt(100000)}_$i")
    r.shuffle(heavy ++ tail)
  }

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("estimates within [f - n/(k+1), f]; heavy items always present") {
    val k = 64
    val xs = stream(7)
    val agg = new MisraGries(k)
    val sk = xs.foldLeft(agg.zero)(agg.reduce)
    val f = trueCounts(xs)
    val err = xs.length.toLong / (k + 1)
    f.foreach { case (w, c) =>
      val est = sk.estimate(w)
      assert(est <= c, s"$w overestimated: $est > $c")
      assert(est >= c - err, s"$w underestimated past bound: $est < $c - $err")
    }
    f.filter(_._2 > err).keys.foreach { w =>
      assert(sk.estimate(w) > 0, s"heavy item $w missing from summary") }
  }

  test("merge preserves the bound for any split of the stream") {
    val k = 32
    val xs = stream(11)
    val agg = new MisraGries(k)
    val f = trueCounts(xs)
    val err = xs.length.toLong / (k + 1)
    for (splitAt <- Seq(1, 100, xs.length / 3, xs.length / 2, xs.length - 1)) {
      val (l, r) = xs.splitAt(splitAt)
      val sk = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      f.foreach { case (w, c) =>
        val est = sk.estimate(w)
        assert(est <= c && est >= c - err, s"split $splitAt: $w est $est vs $c ± $err")
      }
    }
  }

  test("Spark partial aggregation keeps the guarantee at any parallelism") {
    import spark.implicits._
    val k = 64
    val xs = stream(23)
    val f = trueCounts(xs)
    val err = xs.length.toLong / (k + 1)
    val mg = udaf(new MisraGries(k))
    for (parts <- Seq(1, 7)) {
      val sk = xs.toDF("w").repartition(parts)
        .agg(mg(col("w")).as("s")).select("s.*").as[MgSummary].head()
      f.foreach { case (w, c) =>
        val est = sk.estimate(w)
        assert(est <= c && est >= c - err, s"parts=$parts: $w est $est vs $c ± $err")
      }
      f.filter(_._2 > err).keys.foreach { w =>
        assert(sk.estimate(w) > 0, s"parts=$parts: heavy item $w missing") }
    }
  }
}
