/** Round-17 optimization harness: time a SUBSET of declared queries
  * with exactly Bench's methodology (noop sink, same session confs,
  * untimed warmup pass of each query first so codegen/fixture warmup
  * doesn't pollute the comparison). NOT the driver surface — Bench
  * stays the contract; this exists so an optimization round can A/B a
  * handful of queries in seconds instead of re-running all 249.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *     sbt "Test/runMain BenchSubset q_a,q_b[ reps]"
  */
object BenchSubset extends App {
  val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
  val reps = if (args.length > 1) args(1).toInt else 3
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  val spark = graft.Util.withMaster(
      org.apache.spark.sql.SparkSession.builder(), s"local[$cpus]")
    .withExtensions(new graft.GraftExtensions)
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
  try {
    graft.sources.StoreFixture.store(spark, sfDir)
    graft.sources.StoreFixture.storeMonthly(spark, sfDir)
    graft.sources.StoreFixture.manifestStore(spark, sfDir)
    graft.sources.StoreFixture.manifestStorePristine(spark, sfDir)
    graft.sources.StoreFixture.manifestStoreEvolved(spark, sfDir)
    graft.sources.StoreFixture.manifestStoreDeleted(spark, sfDir)
    graft.sources.StoreFixture.manifestStoreRenamed(spark, sfDir)
    graft.sources.StoreFixture.bucketedManifestStore(spark, sfDir)
    graft.sources.StoreFixture.bucketedStore(spark, sfDir)
    graft.sources.StoreFixture.docsJsonl(spark, sfDir)
    graft.sources.StoreFixture.docsOrc(spark, sfDir)
    graft.sources.StoreFixture.eventsCsv(spark, sfDir)
  } catch { case e: Throwable => System.err.println(s"[benchsubset] fixture warmup: $e") }
  for (n <- names) { // untimed warmup, like Bench's per-family warmup
    try graft.SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[benchsubset] warmup $n: $e") }
  }
  val out = names.map { n =>
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    n -> ts.min
  }
  out.foreach { case (n, t) => println(f"SUBSET $n%-36s ${t}%8.3f s (min of $reps)") }
  spark.stop()
}
