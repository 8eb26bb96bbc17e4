package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query inventory lives in graft.queries.*; this object is the glue. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary — exercises scan → filter →
    * partial+final hash agg → sort, Catalyst end to end. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val allDefs: Seq[QueryDef] =
    graft.queries.TsQueries.all ++
    graft.queries.JoinQueries.all ++
    graft.queries.AggQueries.all ++
    graft.queries.WindowQueries.all ++
    graft.queries.ScalarQueries.all ++
    graft.queries.TextQueries.all ++
    graft.queries.VectorQueries.all ++
    graft.queries.StreamQueries.all ++
    graft.queries.PipelineQueries.all ++
    graft.queries.MiscQueries.all ++
    graft.queries.StoreQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
