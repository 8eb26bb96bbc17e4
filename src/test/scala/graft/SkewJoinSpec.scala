package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQE skew-join vs manual salting (VERDICT r10 missing #2): the
  * engine carries BOTH remedies — Spark's own runtime skew split
  * (`spark.sql.adaptive.skewJoin`) and `JoinOps.saltedEquiJoin` — and
  * this spec pins WHEN each applies, so users know the manual
  * machinery is reserved for the shapes AQE cannot fix:
  *
  *  - a plain shuffled equi-join with a hot key: AQE splits the
  *    oversized partition at runtime (the skew=true SMJ below) —
  *    no salting needed;
  *  - the SAME join when its output feeds an operator that requires
  *    hash distribution on the join key (e.g. a groupBy on that key):
  *    OptimizeSkewedJoin declines — splitting would break the
  *    required distribution and force an extra shuffle — so the hot
  *    partition runs as ONE task again; `saltedEquiJoin` (or
  *    `saltedSum` for skewed aggregation) is the remedy;
  *  - skewed AGGREGATION: AQE's skew rule only handles joins;
  *    `saltedSum`'s two-phase monoid split is the fix.
  *
  * The three-way timing evidence at benchmark scale lives in
  * `graft.SkewBench` (BASELINE.md records a run). */
class SkewJoinSpec extends SparkSpec {

  // 60% of fact rows share key 0; the rest spread over 1000 keys
  private def fact: DataFrame =
    spark.range(200000).select(
      when(col("id") % 10 < 6, 0L).otherwise(col("id") % 1000L).as("k"),
      col("id").as("v"))
  private def dim: DataFrame =
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))

  private def withConfs[A](kv: (String, String)*)(body: => A): A =
    Util.withConfs(spark)(kv: _*)(body)

  /** Join forced to stay a shuffle join (dim under the broadcast
    * threshold would otherwise hide the skew question entirely). */
  private def joined: DataFrame = fact.join(dim, "k")

  private val skewConfs = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // test-scale thresholds: the hot partition (~1 MB of compressed
    // shuffle bytes) must read as skewed (default threshold is 256 MB)
    // and split into ~64 KB pieces
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan at execution
    df.queryExecution.executedPlan.toString
  }

  test("AQE splits the hot partition of a plain shuffled join (skew=true)") {
    val (plan, n) = withConfs(skewConfs: _*) {
      val df = joined
      val p = finalPlan(df)
      (p, df.count())
    }
    assert(plan.contains("skew=true"),
      s"AQE skew split did not fire:\n$plan")
    assert(n == 200000L)
  }

  test("a required distribution downstream defeats the AQE split; saltedSum is the remedy") {
    // groupBy on the join key right after the join: the join's output
    // partitioning already satisfies the aggregation's requirement, so
    // OptimizeSkewedJoin would have to add a shuffle to split — it
    // declines, and the hot key runs as one task again
    val (plan, rows) = withConfs(skewConfs: _*) {
      val df = joined.groupBy("k").agg(sum("v").as("sv"))
      (finalPlan(df), df.count())
    }
    assert(!plan.contains("skew=true"),
      s"expected the skew split to DECLINE under a same-key groupBy:\n$plan")
    // keys present in fact: 0 plus the id%1000 values whose last digit
    // is 6-9 → 401 groups
    assert(rows == 401L)
    // the manual two-phase remedy for exactly this shape: partial agg
    // per (key, salt), final per key — monoid-exact
    val salted = graft.operators.JoinOps.saltedSum(
      fact, Seq("k"), "v", saltFrom = col("v"), nSalts = 8)
    val plain = fact.groupBy("k").agg(sum("v").as("sum_v"))
    val a = salted.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = plain.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("saltedEquiJoin equals the plain join bit-for-bit (the no-AQE remedy)") {
    val plain = withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      joined.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(_.toSeq).toSet
    }
    val salted = withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      graft.operators.JoinOps
        .saltedEquiJoin(fact, dim, "k", saltFrom = col("v"), nSalts = 8)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(_.toSeq).toSet
    }
    assert(salted == plain)
  }
}
