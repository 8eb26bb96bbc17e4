package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract invariants: the queries map must expose every
  * declared QueryDef (a duplicated name silently drops one on toMap),
  * and every oracle belongs to a declared query. */
class InventorySpec extends AnyFunSuite {

  test("query names are unique — nothing silently dropped by toMap") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query ids: $dups")
    assert(SparkEntry.queries.size == names.size)
  }

  test("oracle keys are a subset of query keys; inventory is substantial") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 211,
      s"inventory shrank: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 192,
      s"oracled set shrank: ${SparkEntry.oracleSql.size}")
  }
}

/** Driver t1 smoke in a COMPILED JVM (the sbt-console REPL can't
  * serialize its lambda closures to executors, so the skill's
  * interactive recipe is unreliable; this is the same check on the
  * same entry point). entry() deliberately uses no extension-provided
  * feature — plain scan/filter/agg/sort — so running it under the
  * shared test session still demonstrates the extension-free driver
  * smoke session would succeed. */
class EntrySmokeSpec extends SparkSpec {
  test("driver t1 smoke: entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
