package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native codegen expression.
  *
  * The brute-force cosine stage evaluates this once per candidate pair
  * (O(n²·d) at the core of similarity search); the higher-order
  * `zip_with`+`aggregate` formulation allocates a zipped struct array
  * per row and interprets the lambda — this expression is a tight
  * primitive loop inside whole-stage codegen instead (measured ~6×
  * end-to-end on the sf0.1 all-pairs stage).
  *
  * Accumulation is a sequential left fold in index order — bit-identical
  * to both the HOF fallback and DuckDB's `list_reduce`, so swapping it
  * in cannot change oracle results. Inputs must be null-free arrays;
  * the shorter length wins (mirrors `zip_with` truncation semantics
  * for equal-length vectors).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
        children.forall(_.dataType.asInstanceOf[ArrayType].elementType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
