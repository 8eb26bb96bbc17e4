package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, MicrosToTimestamp, UnixMicros}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule canceling epoch↔timestamp round-trips:
  *
  *   unix_micros(timestamp_micros(e))  ⇒  e
  *   timestamp_micros(unix_micros(e))  ⇒  e
  *
  * Both compositions are exact identities (µs BIGINT ↔ TimestampType
  * carry the same µs-since-epoch value, no timezone involvement).
  *
  * Why it matters here: the events fixture carries TIMESTAMP(NANOS),
  * which the reader shims as `timestamp_micros(ts_nanos div 1000)`
  * (Tables.events), and the engine's time-series views immediately
  * project `unix_micros(ts)` back out (Tables.measurements). Without
  * this rule every downstream row pays two no-op conversions and slot
  * arithmetic sits behind a non-pushable expression tree; with it the
  * measurements path reads `ts_nanos div 1000` directly — comparisons
  * against integer literals stay in the integer domain next to the
  * scan. The same cancellation fires for any user pipeline that stores
  * epoch integers but round-trips through TimestampType for windowing.
  */
object SimplifyEpochRoundTrips extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnixMicros(MicrosToTimestamp(e)) => e
      case MicrosToTimestamp(UnixMicros(e)) => e
      // the same round-trips with an interposed no-op cast survive
      // analysis occasionally (timestamp → timestamp); strip them too
      case UnixMicros(Cast(MicrosToTimestamp(e), t, _, _))
          if t.typeName == "timestamp" => e
    }
}
