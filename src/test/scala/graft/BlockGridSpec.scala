package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** The block-grid cosine kernels must be pure functions of the data —
  * independent of physical partitioning — and equal to the reference
  * all-pairs formulation row for row. This is the property the driver
  * hash gate rests on after the round-3 removal of the driver-side
  * corpus ([[VectorOps]] block grid): partial top-k per block + ordered
  * merge must be lossless, and every block pair must meet exactly once. */
class BlockGridSpec extends SparkSpec {

  private def vectors = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // 300 vectors forces multiple blocks (blockCount floors at ~total/64)
    (0 until 300).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("cosineTopK is partitioning-invariant") {
    val a = rows(VectorOps.cosineTopK(vectors.repartition(1), 5))
    val b = rows(VectorOps.cosineTopK(vectors.repartition(13), 5))
    assert(a == b, "top-k result depends on input partitioning")
    assert(a.size == 300 * 5)
  }

  test("cosineTopK equals the all-pairs window formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    val ref = VectorOps.cosinePairs(vectors, (a, b) => a =!= b)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select("a_id", "rn", "b_id", "sim")
    assert(rows(VectorOps.cosineTopK(vectors, 5)) == rows(ref),
      "block-grid top-k diverges from the reference formulation")
  }

  test("cosineThresholdPairs is partitioning-invariant and equals all-pairs") {
    val t = 0.20
    val grid1 = rows(VectorOps.cosineThresholdPairs(vectors.repartition(1), t))
    val grid13 = rows(VectorOps.cosineThresholdPairs(vectors.repartition(13), t))
    assert(grid1 == grid13, "pair set depends on input partitioning")
    val ref = rows(VectorOps.cosinePairs(vectors, (a, b) => a < b)
      .filter(col("sim") >= t).select("a_id", "b_id", "sim"))
    assert(grid1 == ref, "block-pair grid diverges from all-pairs")
    assert(grid1.nonEmpty, "threshold too tight — nothing compared")
  }
}
