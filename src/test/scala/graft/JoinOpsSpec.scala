package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps

/** Salted/temporal join library: salted variants must be row-for-row
  * identical to their unsalted forms (the property that makes salting
  * a pure physical rewrite); as-of/interval joins checked on a known
  * tiny timeline. */
class JoinOpsSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // 10k rows, 90% on key 1 — the hot-device shape
    (0 until 10000).map(i => (if (i % 10 == 0) (i % 7) + 2L else 1L, i.toLong, (i % 97).toLong))
      .toDF("k", "rid", "v")
  }

  private def dim = {
    import spark.implicits._
    (1L to 8L).map(k => (k, s"name$k")).toDF("k", "name")
  }

  test("saltedEquiJoin == plain equi-join, row for row") {
    val plain = skewed.join(dim, "k").select("k", "rid", "v", "name")
    val salted = JoinOps.saltedEquiJoin(skewed, dim, "k", col("rid"), 8)
      .select("k", "rid", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedSum == plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum("v").as("sum_v"))
    val salted = JoinOps.saltedSum(skewed, Seq("k"), "v", col("rid"), 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("asofJoin picks the latest at-or-before row per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 250L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "m90"), (1L, 200L, "m200"), (2L, 60L, "m60"))
      .toDF("k", "mts", "meta")
    val out = JoinOps.asofJoin(left, right.withColumnRenamed("k", "k2")
        .withColumnRenamed("k2", "k"), "k", "ts", "mts")
      .select("tag", "meta").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("e1") == "m90")   // 90 <= 100 < 200
    assert(out("e2") == "m200")  // latest at-or-before 250
    assert(out("e3") == null)    // 60 > 50: nothing at-or-before
  }

  test("intervalJoin matches containing validity interval only") {
    import spark.implicits._
    val left = Seq((1L, 5L), (1L, 15L), (1L, 25L)).toDF("k", "ts")
    val right = Seq((1L, 0L, 10L, "iv0"), (1L, 10L, 20L, "iv1"))
      .toDF("k2", "b", "e", "iv")
    val out = JoinOps.intervalJoin(left,
        right.withColumnRenamed("k2", "k"), "k", "ts", "b", "e")
      .select("ts", "iv").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(5L -> "iv0", 15L -> "iv1")) // 25 matches nothing
  }
}
