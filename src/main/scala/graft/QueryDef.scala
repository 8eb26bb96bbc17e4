package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-visible query: a DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) a textually-parallel DuckDB
  * oracle (SURVEY.md §2). `oracle = None` ⇒ the op is covered by
  * ScalaTest instead and the driver records a rows-only check. */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  // Every declared query retires the PREVIOUS query's intra-query
  // caches at construction (round 17): operators persist shared
  // intermediates for the duration of one query's execution
  // ([[graft.operators.CacheScope]]); the query boundary is where
  // those blocks stop being legitimate — a later query whose
  // canonicalized plan happened to match must recompute, not silently
  // reuse a predecessor's cache. (Before this, the candidate-funnel
  // survivor cache of the >8192-doc probe branch simply leaked for the
  // life of the session.)
  //
  // A GLOBAL final-sort child cache was tried here too (Exchange
  // rangepartitioning's boundary-sampling pass re-executes the
  // post-shuffle tail, so heavy window tails run twice) and NARROWED
  // away after measurement: it wins big exactly once (q_ts_gap_interp,
  // whose dense-grid double-window tail is the repo's heaviest — that
  // query now opts in explicitly) and is neutral-to-negative everywhere
  // else (cache-build serialization + a job barrier vs a cheap tail
  // recompute; q_store_rollup_raw 0.7 → 1.6 s, q_ts_heartbeat +2 s).
  private def scoped(fn: (SparkSession, String) => DataFrame) =
    (s: SparkSession, d: String) => {
      graft.operators.CacheScope.retire()
      fn(s, d)
    }
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, scoped(fn), Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, scoped(fn), None)
}
