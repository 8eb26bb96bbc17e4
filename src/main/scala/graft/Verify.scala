package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional name filters (prefix match) for fast local iteration;
    // the driver always calls with exactly two args = run everything
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Util.withMaster(SparkSession.builder(), s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write µs (not INT96) so DuckDB/pyarrow read the same instants
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // driver testdata may carry tz-naive parquet timestamps
      // (isAdjustedToUTC=false); read them as session-TZ instants (UTC,
      // so identical epoch µs), not TIMESTAMP_NTZ — unix_micros() and
      // every ts_us derivation require TIMESTAMP
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // SPARK_GRAFT_WIDE_MOMENTS=true → the §7.4 magnitude escape
      // hatch (Util.wideMoments): scale_verify's --wide arm sets this
      .config("spark.graft.wideMoments",
        sys.env.getOrElse("SPARK_GRAFT_WIDE_MOMENTS", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The driver's testdata carries tz-naive timestamps and its DuckDB
    // oracle writes naive timestamp[us]; with inferTimestampNTZ=false we
    // read them as UTC instants, so a passthrough TimestampType output
    // column would serialize as timestamp[us, tz=UTC] and fail the
    // driver's pandas dtype/schema compare on identical instants
    // (round-9 q_scan_parquet). Session TZ is UTC, so casting top-level
    // TimestampType outputs to TIMESTAMP_NTZ is wall-clock identical and
    // matches the oracle's naive dtype exactly.
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        try Util.ntzNormalize(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    def q(s: String): String = Util.jsonEscape(s)
    // __SF__ in oracle SQL = the data-dir basename (fixture exports
    // live under /tmp/graft_*/<basename>/): resolved here, at dump
    // time, so file-source oracles track whatever sf this sweep runs
    // at instead of pinning one scale's literal path.
    val sfBase = new java.io.File(sfDir).getName
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__SF__", sfBase))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
