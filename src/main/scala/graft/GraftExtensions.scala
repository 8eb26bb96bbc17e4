package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, WrapDelta}
import graft.plans.SimplifyEpochRoundTrips

/** Session extensions registering graft's native Catalyst functions
  * and optimizer rules.
  * Install with `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimplifyEpochRoundTrips)
    ext.injectOptimizerRule(session => graft.plans.RollupSubstitution(session))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("wrap_delta"),
      new ExpressionInfo(classOf[WrapDelta].getCanonicalName, "wrap_delta"),
      (children: Seq[Expression]) => WrapDelta(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
  }
}
