package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMin, CountMinBuild}

/** Count-min laws: never undercounts, overcount within the analytic
  * bound, cell-wise-sum merge is EXACT (split-and-merge == flat, bit
  * for bit), partitioning-invariant under Spark partial aggregation. */
class CountMinSpec extends SparkSpec {

  private def stream(seed: Int): Seq[Long] = {
    val r = new scala.util.Random(seed)
    // zipf-ish: item i (0..49) with frequency ~ 1000/(i+1), plus tail
    val heavy = (0 until 50).flatMap(i => Seq.fill(1000 / (i + 1))(i.toLong))
    val tail = Seq.fill(5000)(r.nextLong())
    r.shuffle(heavy ++ tail)
  }

  test("never undercounts; overcount within 2n/Width at >= 1-2^-Depth rate") {
    val xs = stream(3)
    val cells = CountMin.emptyCells
    xs.foreach(CountMin.add(cells, _))
    val f = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = 2L * xs.length / CountMin.Width
    var over = 0
    f.foreach { case (x, c) =>
      val est = CountMin.estimate(cells, x)
      assert(est >= c, s"undercount for $x: $est < $c")
      if (est - c > bound) over += 1
    }
    // per-item failure prob <= 2^-Depth; allow 3x slack on the rate
    assert(over <= math.max(1, 3 * f.size / (1 << CountMin.Depth)),
      s"$over of ${f.size} items exceeded the 2n/W bound")
  }

  test("split-and-merge equals the flat sketch exactly") {
    val xs = stream(17)
    val flat = CountMin.emptyCells
    xs.foreach(CountMin.add(flat, _))
    for (splitAt <- Seq(1, xs.length / 3, xs.length - 1)) {
      val (l, r) = xs.splitAt(splitAt)
      val a = CountMin.emptyCells; l.foreach(CountMin.add(a, _))
      val b = CountMin.emptyCells; r.foreach(CountMin.add(b, _))
      assert(CountMin.merge(a, b).sameElements(flat), s"merge != flat at $splitAt")
    }
  }

  test("Spark partial aggregation yields the identical sketch at any parallelism") {
    import spark.implicits._
    val cm = udaf(new CountMinBuild)
    def sketchWith(parts: Int): Array[Long] =
      Tables.events(spark, Sf)
        .select(xxhash64(col("user_id")).as("h"))
        .repartition(parts)
        .agg(cm(col("h"))).head().getAs[scala.collection.Seq[Long]](0).toArray
    assert(sketchWith(1).sameElements(sketchWith(13)),
      "sketch depends on partitioning")
  }
}
