package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Wrap-corrected counter delta — the reference's counter-wrap rule
  * [pub: tsdb/aggregator.py, Aggregator.update: `if delta < 0: delta +=
  * 2**bits` — unverified, mount empty, SURVEY.md §0] generalized to an
  * arbitrary capacity: `wrap_delta(prev, cur, cap) = ((cur - prev) % cap
  * + cap) % cap`, defined for prev, cur ∈ [0, cap).
  *
  * Implemented as a native Catalyst Expression with `doGenCode` (not a
  * Scala UDF) so it stays inside whole-stage codegen — on a 100 TB rate
  * derivation this sits in the innermost loop and UDF boxing would
  * dominate. Registered as SQL function `wrap_delta` by
  * [[graft.GraftExtensions]].
  */
case class WrapDelta(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wrap_delta expects (BIGINT, BIGINT, BIGINT), got ${children.map(_.dataType.sql).mkString(", ")}")
  override def dataType: DataType = LongType
  override def prettyName: String = "wrap_delta"

  override protected def nullSafeEval(prev: Any, cur: Any, cap: Any): Any = {
    val c = cap.asInstanceOf[Long]
    ((cur.asInstanceOf[Long] - prev.asInstanceOf[Long]) % c + c) % c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c, cap) => s"((($c - $p) % $cap + $cap) % $cap)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
