package graft

import org.apache.spark.sql.SparkSession

/** Small helpers shared across mains/specs (extracted round 11 — the
  * JSON escaper in particular must stay byte-identical between
  * Verify's and Fuzz's `oracle_sql.json` writers, which feed the same
  * driver-side json.load). */
object Util {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise
    * make the driver's json.load fail. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Cast every top-level TimestampType column to TIMESTAMP_NTZ
    * (§7.4 tz-naive discipline): the driver testdata and the DuckDB
    * oracle both carry naive-µs timestamps, and with a UTC session
    * the cast is wall-clock identical. One definition feeds BOTH
    * parquet writers the oracle reads back (Verify's query dumps and
    * ScaleVerify's replica corpus) — round-12 review: the two copies
    * must never drift, or one side reintroduces the Spark-metadata
    * read-back divergence. */
  def ntzNormalize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampType)
        col(f.name).cast("timestamp_ntz").as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  /** JDK-17 `--add-opens` Spark 4 needs in every JVM it launches.
    * Mirrors build.sbt's `jdk17AddOpens` (which covers only the
    * DRIVER JVM sbt forks): multi-JVM masters spawn executor JVMs
    * through SPARK_HOME's launcher, which does NOT inherit sbt's
    * javaOptions, so the opens must ride spark.executor.extraJavaOptions. */
  val Jdk17Opens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  /** Apply the session master, honoring a `SPARK_GRAFT_MASTER` env
    * override (round 13: the multi-JVM gate). For a multi-JVM master
    * (`local-cluster[w,c,mb]` or a standalone `spark://`), executor
    * JVMs are launched by the worker from SPARK_HOME — they get the
    * Spark jars but NOT this build's classes or sbt's JVM flags, so:
    *  - ship the driver's full classpath by path (same-host workers
    *    share the filesystem; spark.jars would also work but path
    *    classpath covers test-classes and the coursier scalatest jars
    *    in one stroke),
    *  - re-state the JDK-17 opens for the executor JVMs,
    *  - size spark.executor.memory under the per-worker budget
    *    (default 1g is Spark's; SPARK_GRAFT_EXECUTOR_MEM overrides). */
  def withMaster(b: SparkSession.Builder, default: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", default)
    val withM = b.master(master)
    if (master.startsWith("local-cluster") || master.startsWith("spark://")) {
      // executor memory must fit the per-worker budget — for
      // local-cluster[w,c,mb] take the declared mb (one executor per
      // worker; Spark's 1g default would waste the budget and a fixed
      // larger default dies loudly at "requested > MiB/worker")
      val execMem = sys.env.get("SPARK_GRAFT_EXECUTOR_MEM").orElse {
        "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)\\s*\\]".r
          .findFirstMatchIn(master).map(_.group(1) + "m")
      }.getOrElse("3g")
      withM
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        // NB no -Dspark.* here: SparkConf.validateSettings rejects
        // Spark options inside executor extraJavaOptions
        .config("spark.executor.extraJavaOptions", Jdk17Opens)
        .config("spark.executor.memory", execMem)
    } else withM
  }

  /** The §7.4 magnitude escape hatch (round 13, VERDICT r12 next #3):
    * `spark.graft.wideMoments=true` switches the eight
    * magnitude-BOUNDED moment families (CORRECTNESS_SCALE.md's mag-sum
    * exclusion table: skew/anomaly/autocorr/xcorr/zscore at |cents| ≥
    * 3.0e9, tri/wmean at their product bounds, holt past |level| ≈
    * 10⁷) onto exact wide paths with NO int64 intermediate, at the
    * proven ~1.1–1.3× decimal-accumulation cost. Default stays false:
    * fast int64 per-term products that fail LOUDLY under ANSI past
    * their documented bounds. */
  def wideMoments(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.wideMoments").exists(_.toBoolean)

  /** Per-term moment product a·b feeding a DECIMAL(38,0) group sum.
    * Default: the int64 product, cast AFTER multiplying — fast
    * (codegen int64 multiply), exact while |a·b| < 2^63, LOUD past it
    * under ANSI. Wide: the FIRST factor casts to decimal(19,0) before
    * multiplying (mirroring the oracles' CAST(x AS HUGEINT)·x), so no
    * int64 intermediate exists and the term is exact to ~1e38. Both
    * shapes produce DECIMAL(38,0), so the summed column's type — and
    * the final cast-to-double of the same exact integer — is identical
    * either way. */
  def momentProd(s: SparkSession)(a: org.apache.spark.sql.Column,
                                  b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    if (wideMoments(s)) (a.cast("decimal(19,0)") * b).cast("decimal(38,0)")
    else (a * b).cast("decimal(38,0)")
  }

  /** The loud-overflow contract behind every magnitude-bounded §7.4
    * kernel: int64 products past their documented bound must FAIL, not
    * wrap — and Spark only guarantees that under ANSI. A non-ANSI
    * session running a bounded kernel without the wide path is the one
    * configuration that could return a plausible wrong answer, so it
    * is rejected here (VERDICT r12 wrong #3). */
  def requireLoudOverflow(s: SparkSession): Unit = {
    val ansi = s.conf.get("spark.sql.ansi.enabled", "true").toBoolean
    require(ansi || wideMoments(s),
      "magnitude-bounded moment kernels need spark.sql.ansi.enabled=true " +
        "(so an out-of-bound int64 product fails loudly instead of wrapping " +
        "silently) or spark.graft.wideMoments=true (the exact DECIMAL path " +
        "with no int64 intermediate)")
  }

  /** Run `body` with the given SQL confs set, restoring (or
    * unsetting) the previous values afterwards. */
  def withConfs[A](spark: SparkSession)(kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
