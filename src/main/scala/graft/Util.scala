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
