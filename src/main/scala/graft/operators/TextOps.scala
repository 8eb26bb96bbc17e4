package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (SURVEY.md §2 J). All transforms are pure column expressions /
  * generators — no UDFs — so they stay inside whole-stage codegen and
  * scale linearly with input splits on a cluster. */
object TextOps {

  /** One row per (doc_id, word). */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))

  /** Distinct word n-gram shingles per doc: one row per (doc_id, sh).
    * Index arithmetic over the token array (1-based `element_at`,
    * matching DuckDB list indexing) rather than a self-join — the
    * shingle set is produced in a single narrow pass. */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val mk = (1 to n).map(k => s"element_at(arr, CAST(i + ${k - 1} AS INT))")
      .mkString("concat_ws(' ', ", ", ", ")")
    docs.select(col("doc_id"), split(col("text"), " ").as("arr"))
      .filter(size(col("arr")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(arr) - ${n - 1}), i -> $mk)")).as("sh"))
      .distinct()
  }

  /** Per-doc token stats used by quality scoring and language ID. */
  def tokenStats(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    // typed isin, not interpolated SQL: safe for empty lists and for
    // stopwords containing quotes
    val isStop =
      if (stopwords.isEmpty) lit(false) else col("word").isin(stopwords: _*)
    tokens(docs).groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("word")).as("n_distinct"),
        count(when(isStop, 1)).as("stop_hits"))
  }

  /** Deterministic polynomial fingerprint over the token stream — a
    * rolling-hash document signature computed with a sequential
    * higher-order fold (identical evaluation order in DuckDB). */
  def fingerprint(textCol: Column): Column =
    expr("""aggregate(
      |  transform(split(text, ' '),
      |    w -> CAST(length(w) AS BIGINT) * 31 + CAST(ascii(w) AS BIGINT)),
      |  CAST(0 AS BIGINT), (a, x) -> (a * 131 + x) % 1000000007)""".stripMargin)
}
