package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes the engine needs beyond vanilla equi-joins
  * (SURVEY.md §2 D), packaged as reusable transforms.
  *
  * Skew toolkit: at 100 TB a handful of hot keys (one chatty device,
  * one viral document) can pin a whole stage on one task. AQE's skew
  * handling covers sort-merge joins; for explicit control, the salted
  * variants here split hot keys across `nSalts` subtasks with
  * deterministic salts and provably identical results (see JoinOpsSpec).
  */
object JoinOps {

  /** As-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` on the same key (the reference's IfRef
    * point-in-time metadata resolution). Broadcast the (small)
    * metadata side; pick-latest is one window pass. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    // alias-qualified so the two sides may freely share column names;
    // right-side collisions (incl. the key) come out suffixed "_right"
    val l = left.withColumn("__rid", monotonically_increasing_id()).alias("__l")
    val r = right.alias("__r")
    val w = Window.partitionBy("__rid")
      .orderBy(col(s"__r.$rightTs").desc_nulls_last)
    val joined = l.join(broadcast(r),
        col(s"__l.$key") === col(s"__r.$key") &&
          col(s"__r.$rightTs") <= col(s"__l.$leftTs"), "left")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val leftNames = left.columns.toSet
    val outCols =
      left.columns.map(c => col(s"__l.$c").as(c)) ++
      right.columns.filter(_ != key).map { c =>
        col(s"__r.$c").as(if (leftNames(c)) s"${c}_right" else c)
      }
    joined.select(outCols.toIndexedSeq: _*)
  }

  /** Distributed as-of join via the native merge operator
    * (graft.plans.AsofJoin — requires GraftExtensions installed): both
    * sides hash-partitioned by key and merged sorted, so it scales to
    * right sides far beyond broadcast reach and never materializes the
    * (left × earlier-right) pair space. Same semantics as [[asofJoin]];
    * `rightTie` pins which equal-ts right row is "latest".
    * Key and both ts columns must be non-null BIGINT. */
  def asofJoinMerge(left: DataFrame, right: DataFrame, leftKey: String,
                    leftTs: String, rightKey: String, rightTs: String,
                    rightTie: String): DataFrame = {
    import org.apache.spark.sql.graftshim.DatasetBridge
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) = {
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
      // the exec reads key/ts/tie by ordinal with getLong: any other
      // type would run and silently mis-join, so fail fast instead
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"asofJoinMerge requires BIGINT for $n, got ${a.dataType.sql}; cast first " +
          "(null key/ts rows are the caller's to filter — nulls read as 0)")
      a
    }
    DatasetBridge.ofRows(left.sparkSession,
      graft.plans.AsofJoin(l, r,
        attr(l, leftKey), attr(l, leftTs),
        attr(r, rightKey), attr(r, rightTs), attr(r, rightTie)))
  }

  /** Interval (temporal validity) join: left rows matched to the right
    * interval containing their timestamp: `b <= ts < e` on the same
    * key. Plans as BroadcastHashJoin on the key with the range as
    * residual — never a cartesian. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   ts: String, b: String, e: String): DataFrame =
    left.join(broadcast(right),
      left(key) === right(key) && left(ts) >= right(b) && left(ts) < right(e))

  /** Skew-safe equi-join of a huge skewed fact against a small-ish
    * dim that is too big to broadcast: fact rows get a deterministic
    * salt from `saltFrom` (any column; uniqueness helps spread), the
    * dim is replicated across all salts, and the join key becomes
    * (key, salt) — a hot key now occupies `nSalts` tasks. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     saltFrom: Column, nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe aggregation: two-phase sum — partial per (keys, salt),
    * final per keys. Valid for any commutative monoid (sum/count/
    * min/max); exact-integer inputs keep it bit-deterministic. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltFrom: Column, nSalts: Int): DataFrame = {
    val cols = keys.map(col)
    df.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
      .groupBy((cols :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(cols: _*)
      .agg(sum("__partial").as(s"sum_$valueCol"))
  }
}
