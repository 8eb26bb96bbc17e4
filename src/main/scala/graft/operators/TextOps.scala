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

  /** Exact shingle-set Jaccard near-dup pairs (a_id < b_id, jacc ≥
    * minJacc, rounded 4 dp) — the exact form MinHash approximates. The
    * candidate space is bounded by the shingle equi-join (only docs
    * sharing a shingle ever meet), intersections are map-side-combined
    * counts, and the two size joins are broadcast-able aggregates. */
  def jaccardPairs(docs: DataFrame, n: Int, minJacc: Double): DataFrame = {
    val sh = shingles(docs, n)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("a_id", "sh")
    val b = sh.toDF("b_id", "sh")
    val ix = a.join(b, a("sh") === b("sh") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    val jacc = col("i").cast("double") /
      (col("na") + col("nb") - col("i")).cast("double")
    ix.join(sz.toDF("a_id", "na"), "a_id")
      .join(sz.toDF("b_id", "nb"), "b_id")
      .filter(jacc >= minJacc)
      .select(col("a_id"), col("b_id"), round(jacc, 4).as("jacc"))
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
