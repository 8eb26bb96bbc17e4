package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Differential-fuzz runner (VERDICT r10 next #1): executes the Spark
  * side of [[graft.fuzz.QueryGen]]'s seeded query set inside a
  * GraftExtensions session (so the repo's own optimizer rules are in
  * the fuzzed path), writes each result to `outDir/<name>` parquet,
  * and dumps the DuckDB renderings as `outDir/oracle_sql.json` — the
  * exact layout `scripts/check_driver.py` consumes, so
  * `scripts/fuzz.py` reuses the driver-faithful pandas-hash compare
  * unchanged. A query that fails on the Spark side writes no output
  * dir, which the compare reports as a FAIL (never silently skipped).
  *
  * Run:  sbt "runMain graft.Fuzz <sfDir> <outDir> [seed] [count] [tvfCount]"
  */
object Fuzz {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val seed = if (args.length > 2) args(2).toLong else 11L
    val count = if (args.length > 3) args(3).toInt else 500
    // TVF draws ride along by default (round 14, VERDICT r13 next #6):
    // the graft_fetch* SQL TEXT path under the same seeded pressure
    val tvfCount = if (args.length > 4) args(4).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)

    // TVF draws need the store fixture (built once per sf under /tmp);
    // their Spark text carries __STORE__, resolved here — the DuckDB
    // side reads the events view the fixture was ingested from
    // draws alternate between the rename-layout fixture and a
    // PRISTINE manifest-layout twin (identical content ⇒ identical
    // oracles), so snapshot resolution shares the seeded pressure
    val tvf =
      if (tvfCount <= 0) Seq.empty
      else {
        val store = graft.sources.StoreFixture.store(spark, sfDir)
        val mstore = graft.sources.StoreFixture.manifestStorePristine(spark, sfDir)
        graft.fuzz.TvfGen.generate(seed, tvfCount).zipWithIndex
          .map { case (q, i) =>
            q.copy(sparkSql = q.sparkSql
              .replace("__STORE__", if (i % 2 == 0) store else mstore))
          }
      }
    val queries = graft.fuzz.QueryGen.generate(seed, count) ++ tvf
    var failed = 0
    queries.foreach { q =>
      try spark.sql(q.sparkSql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${q.name}")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] ${q.name} failed: ${e.getMessage}")
        System.err.println(s"[fuzz]   spark sql: ${q.sparkSql}")
      }
    }
    def esc(s: String): String = Util.jsonEscape(s)
    val json = queries.map(q => s"${esc(q.name)}: ${esc(q.duckSql)}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[fuzz] ${queries.size - failed}/${queries.size} spark-side ok " +
      s"(seed=$seed)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
