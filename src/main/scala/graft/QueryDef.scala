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
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
