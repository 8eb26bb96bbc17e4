package graft

import java.nio.file.Files

import graft.sources.TsdbStore

/** graft_fetch SQL table function: parity with the Scala fetch API
  * across arg arities and cfs, and clear rejection of bad calls. */
class TvfSpec extends SparkSpec {

  private lazy val store: String = {
    val dir = Files.createTempDirectory("graft_tvf").toString
    TsdbStore.ingest(spark, Tables.events(spark, Sf), dir)
    dir
  }

  private val B = 1704844800L
  private val E = 1705708800L

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("SQL text resolves to the same rows as the Scala API, every arity") {
    // raw fetch (5 args)
    assert(rows(spark.sql(s"SELECT * FROM graft_fetch('$store', 7, 'click', $B, $E)")) ==
      rows(TsdbStore.fetch(spark, store, 7L, "click", B, E)))
    // consolidated (6 args, default cf)
    assert(rows(spark.sql(
        s"SELECT * FROM graft_fetch('$store', 3, 'view', $B, $E, 21600)")) ==
      rows(TsdbStore.fetch(spark, store, 3L, "view", B, E, aggStep = 21600L)))
    // counter cf (7 args) reads the rate cascade
    assert(rows(spark.sql(
        s"SELECT * FROM graft_fetch('$store', 3, 'view', $B, $E, 21600, 'rate')")) ==
      rows(TsdbStore.fetch(spark, store, 3L, "view", B, E,
        aggStep = 21600L, cf = "rate")))
  }

  test("bad calls fail with the usage message, not a planner stack trace") {
    val tooFew = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_fetch('$store', 7)").collect()
    }
    assert(tooFew.getMessage.contains("usage: graft_fetch"), tooFew.getMessage)
    val badAgg = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_fetch('$store', 7, 'click', $B, $E, 12345)")
        .collect()
    }
    assert(badAgg.getMessage.contains("no such aggregate"), badAgg.getMessage)
  }
}
