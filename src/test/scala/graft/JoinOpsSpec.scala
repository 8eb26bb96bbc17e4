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

  test("asofJoinMerge: native merge exec equals broadcast+window asofJoin") {
    import spark.implicits._
    // random-ish series: 40 keys × left events + metadata updates
    val rnd = new scala.util.Random(11)
    val left = (1 to 800).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100000).toLong * 2 + 1, i.toLong)
    }.toDF("k", "ts", "l_id")
    val right = (1 to 300).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100000).toLong * 2, i.toLong)
    }.toDF("k", "mts", "r_id")

    val merged = JoinOps.asofJoinMerge(left, right,
        leftKey = "k", leftTs = "ts", rightKey = "k", rightTs = "mts",
        rightTie = "r_id")
      .selectExpr("l_id", "r_id AS got")
    // reference implementation (right side renamed to avoid collision)
    val ref = JoinOps.asofJoin(left,
        right.toDF("k", "mts", "r_id"), "k", "ts", "mts")
      .selectExpr("l_id", "r_id AS got")
    assert(merged.count() == 800)
    assert(merged.exceptAll(ref).isEmpty && ref.exceptAll(merged).isEmpty,
      "merge as-of join disagrees with broadcast+window reference")
  }

  test("asofJoinMerge plans the custom exec with declared exchanges, no broadcast") {
    import spark.implicits._
    val left = Seq((1L, 100L, 1L)).toDF("k", "ts", "l_id")
    val right = Seq((1L, 90L, 7L)).toDF("k", "mts", "r_id")
    val p = JoinOps.asofJoinMerge(left, right, "k", "ts", "k", "mts", "r_id")
      .queryExecution.executedPlan.toString
    // SparkPlan display strips the "Exec" suffix from node names
    assert(p.contains("AsofJoin"), s"custom exec missing:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      "declared ClusteredDistribution did not produce exchanges")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      "merge as-of join should not broadcast")
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
