package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native distributed as-of join (left outer): for every left row, the
  * latest right row with `rightTs <= leftTs` on the same key.
  *
  * WHY a custom operator: the composable formulations both hit a scale
  * wall — broadcast+window (JoinOps.asofJoin) needs the right side on
  * every executor, and a plain range-join explodes to one row per
  * (left, earlier-right) pair before the pick-latest window prunes it.
  * The classic answer is a co-partitioned MERGE: hash-partition both
  * sides by key, sort by (key, ts), then a single forward pass per
  * partition keeps O(1) state — no pair blow-up, no broadcast, linear
  * in input. Spark's built-ins cannot express "join against a moving
  * last-row cursor", so this is preference (c) from the design notes:
  * LogicalPlan + Strategy + physical exec via SparkSessionExtensions.
  *
  * Distribution/ordering are DECLARED, not hand-built: EnsureRequirements
  * inserts the exchanges/sorts (and AQE still re-plans them), so the
  * operator composes with the rest of the planner like any built-in.
  *
  * Keys and timestamps must be non-null BIGINT (epoch-µs); ties on
  * rightTs resolve to the last row in (rightTs, rightTie) order.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightTie: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, lt, rk, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightTie: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides clustered by key → EnsureRequirements co-partitions them
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // merge needs (key, ts) order; the right tiebreak pins which of the
  // equal-ts rows is "latest" so results are deterministic
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    def ord(attrs: Seq[Attribute], a: Attribute): Int = {
      val i = attrs.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"attribute $a not found in $attrs")
      i
    }
    val lkOrd = ord(left.output, leftKey)
    val ltOrd = ord(left.output, leftTs)
    val rkOrd = ord(right.output, rightKey)
    val rtOrd = ord(right.output, rightTs)
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered
      // O(1) merge state: the latest right row at-or-before the left
      // cursor, valid for `matchKey` only
      var matchRow: InternalRow = null
      var matchKey = 0L
      lIt.map { l =>
        val lk = l.getLong(lkOrd)
        val lt = l.getLong(ltOrd)
        if (matchRow != null && matchKey != lk) matchRow = null
        var advance = true
        while (advance && rBuf.hasNext) {
          val h = rBuf.head
          val hk = h.getLong(rkOrd)
          if (hk < lk) { rBuf.next() } // right key exhausted below left cursor
          else if (hk == lk && h.getLong(rtOrd) <= lt) {
            matchRow = rBuf.next().copy() // last-seen = latest (sorted asc)
            matchKey = lk
          } else advance = false
        }
        proj(joined(l, if (matchRow != null) matchRow else nullRight))
      }
    }
  }
}
