package graft

import java.nio.file.{Files, Paths}

/** Dump `SparkEntry.oracleSql` as JSON WITHOUT starting Spark or
  * touching any data — the fast half of `graft.Verify`'s output, for
  * tooling that needs the oracle text before deciding which queries to
  * run (scripts/scale_subsets.py derives the scale_verify `--preset`
  * sets from it: which oracled queries read the `events` table, etc.).
  * `__SF__` placeholders are left UNRESOLVED — subset predicates match
  * on table references, not fixture paths. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    def q(s: String): String = Util.jsonEscape(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"""{"oracle_dump":"$out","n":${SparkEntry.oracleSql.size}}""")
  }
}
