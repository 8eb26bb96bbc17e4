package graft

import graft.fuzz.QueryGen

/** The in-JVM half of the differential fuzz harness (VERDICT r10
  * next #1). The cross-engine oracle sweep is `scripts/fuzz.py`
  * (graft.Fuzz → DuckDB via check_driver's pandas-hash compare, ≥500
  * queries per round); this spec pins what `sbt test` can check
  * without DuckDB:
  *
  *  - the generator is DETERMINISTIC per (seed, i) — the property
  *    that makes a fuzz failure reproducible by name;
  *  - every generated query analyzes and executes under
  *    GraftExtensions (a generator emitting invalid SQL would turn
  *    the oracle sweep into noise);
  *  - results are CONFIG-METAMORPHIC: identical rows under different
  *    shuffle partitioning, AQE on/off, and whole-stage codegen
  *    on/off. This is the §7.4 discipline made testable — every
  *    generated aggregate is an exact integer/selection form, so any
  *    config-sensitive result is a real bug (in the generator's
  *    discipline or the engine), not float noise. */
class FuzzSpec extends SparkSpec {

  private def registerViews(): Unit =
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$Sf/$t.parquet").createOrReplaceTempView(t)

  private def rowsOf(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).sorted.toSeq

  private def withConfs[A](kv: (String, String)*)(body: => A): A =
    Util.withConfs(spark)(kv: _*)(body)

  test("generation is deterministic per (seed, index)") {
    val a = QueryGen.generate(7L, 50)
    val b = QueryGen.generate(7L, 50)
    assert(a == b)
    // distinct seeds explore distinct queries (not a frozen template)
    val c = QueryGen.generate(8L, 50)
    assert(a.map(_.sparkSql) != c.map(_.sparkSql))
  }

  test("120 seeded queries execute green under GraftExtensions") {
    registerViews()
    val qs = QueryGen.generate(23L, 120)
    val failures = qs.flatMap { q =>
      try { spark.sql(q.sparkSql).collect(); None }
      catch { case e: Throwable =>
        Some(s"${q.name}: ${e.getMessage}\n  ${q.sparkSql}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed:\n${failures.take(3).mkString("\n")}")
  }

  test("results are invariant across shuffle partitioning, AQE, and codegen") {
    registerViews()
    val qs = QueryGen.generate(42L, 40)
    qs.foreach { q =>
      val base = rowsOf(q.sparkSql)
      val parts = withConfs("spark.sql.shuffle.partitions" -> "3") {
        rowsOf(q.sparkSql)
      }
      assert(parts == base, s"${q.name}: shuffle-partition-sensitive result\n${q.sparkSql}")
      val noAqe = withConfs("spark.sql.adaptive.enabled" -> "false") {
        rowsOf(q.sparkSql)
      }
      assert(noAqe == base, s"${q.name}: AQE-sensitive result\n${q.sparkSql}")
      val noCodegen = withConfs("spark.sql.codegen.wholeStage" -> "false") {
        rowsOf(q.sparkSql)
      }
      assert(noCodegen == base, s"${q.name}: codegen-sensitive result\n${q.sparkSql}")
    }
  }
}
