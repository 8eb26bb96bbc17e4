package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps
import graft.sources.TsdbStore

/** Differential fuzzing of the ROLLUP SUBSTITUTION rule (round 11):
  * the rule is the repo's largest optimizer surface, and its spec
  * enumerates ~40 hand-picked shapes — this spec throws seeded RANDOM
  * slot-aggregation queries at it and pins the only invariant that
  * matters: with the flag ON, every query returns exactly the rows
  * the raw flag-OFF plan returns (the raw plan IS the oracle; a
  * decline is always legal, a wrong substitution never). Shapes
  * drawn: grouping subsets of (user_id, event_type, slot@step) incl.
  * fleet-wide and global, steps that hit/re-aggregate/decline the
  * cascade, monoid + distinct + approx + dyadic percentile
  * aggregates, transferable and non-transferable filters, aligned
  * and UNALIGNED time ranges (the split path), HAVING, and top-k.
  * A floor on how many queries actually rewrote keeps the test from
  * degenerating into raw-vs-raw. */
class RollupFuzzSpec extends SparkSpec {

  private val Flag = "spark.graft.rollup.rewrite"

  private lazy val store: String = {
    val dir = Files.createTempDirectory("graft_rollup_fuzz").toString
    TsdbStore.ingest(spark, Tables.events(spark, Sf), dir)
    dir
  }

  // fixture range (sf0.001 events live in Jan 2024); bounds land
  // inside it so ranges are non-degenerate
  private val T0 = 1704067200L // 2024-01-01
  private val T1 = 1706745600L // 2024-02-01

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  /** One random slot-aggregation query over the store's base table. */
  private def gen(r: Random): DataFrame = {
    var df = spark.read.parquet(s"$store/base")

    // optional series-identity filter (transferable) or a
    // non-transferable predicate (must decline, still correct)
    r.nextInt(4) match {
      case 0 => df = df.filter(col("event_type") ===
        pick(r, Seq("click", "view", "purchase", "signup", "error")))
      case 1 => df = df.filter(col("user_id") < (r.nextInt(12) + 2).toLong)
      case 2 if r.nextBoolean() =>
        df = df.filter(col("cents") % 7 =!= 3) // non-identity: declines
      case _ => ()
    }

    // optional ts_us range: aligned (transfers) or unaligned (splits)
    if (r.nextInt(3) > 0) {
      val aligned = r.nextBoolean()
      val step = 86400L
      val lo = T0 + r.nextInt(20).toLong * step
      val hi = lo + (r.nextInt(8) + 1).toLong * step
      val (loUs, hiUs) =
        if (aligned) (lo * 1000000L, hi * 1000000L)
        else (lo * 1000000L + r.nextInt(1000000) * 1000L,
          hi * 1000000L - r.nextInt(1000000) * 1000L)
      df = df.filter(col("ts_us") >= loUs && col("ts_us") < hiUs)
    }

    val step = pick(r, Seq(21600L, 43200L, 86400L, 172800L, 604800L, 10800L))
    val gUid = r.nextBoolean()
    val gEtype = r.nextBoolean()
    val gSlot = r.nextInt(4) > 0
    val keyNames = (if (gUid) Seq("user_id") else Nil) ++
      (if (gEtype) Seq("event_type") else Nil) ++
      (if (gSlot) Seq("slot_ts") else Nil)
    val keys = (if (gUid) Seq(col("user_id")) else Nil) ++
      (if (gEtype) Seq(col("event_type")) else Nil) ++
      (if (gSlot) Seq(TimeSeriesOps.slotSec(step).as("slot_ts")) else Nil)

    val aggPool = Seq(
      () => count(lit(1)).as("n"),
      () => sum("cents").as("s"),
      () => min("cents").as("mn"),
      () => max("cents").as("mx"),
      () => avg("cents").as("av"),
      () => countDistinct(col("user_id")).as("du"),
      () => approx_count_distinct(col("user_id")).as("adu"),
      () => expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").as("p50"),
      () => expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY cents)").as("p25"))
    val nAggs = r.nextInt(3) + 1
    val aggs = Seq.fill(nAggs)(pick(r, aggPool)()) :+ count(lit(1)).as("cnt")

    var q =
      if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

    if (r.nextInt(4) == 0) q = q.filter(col("cnt") > r.nextInt(3))
    if (r.nextInt(4) == 0 && keys.nonEmpty)
      // top-k must be a TOTAL order or the limited row set itself is
      // plan-dependent: tie-break on every grouping key
      q = q.orderBy(col("cnt").desc +: keyNames.map(col): _*)
        .limit(r.nextInt(50) + 1)
    q
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withFlag[A](on: Boolean)(body: => A): A = {
    spark.conf.set(Flag, on.toString)
    try body finally spark.conf.unset(Flag)
  }

  private def substituted(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten.exists(p => p.contains("/agg_") || p.contains("/quant_"))

  test("150 random slot aggregations: flag-on rows == flag-off rows") {
    store // force fixture
    var fired = 0
    val failures = (0 until 150).flatMap { i =>
      def q = gen(new Random(7700L + i))
      try {
        val on = withFlag(on = true) {
          if (substituted(q)) fired += 1
          rows(q)
        }
        val off = withFlag(on = false)(rows(q))
        if (on == off) None
        else Some(s"query $i: flag-on != flag-off " +
          s"(${on.size} vs ${off.size} rows)\n${q.queryExecution.logical}")
      } catch {
        case e: Throwable => Some(s"query $i crashed: ${e.getMessage}")
      }
      // note: gen() re-draws from the same seed for both arms, so the
      // two evaluations see the identical logical query
    }
    assert(failures.isEmpty,
      s"${failures.size} mismatches:\n${failures.take(3).mkString("\n")}")
    assert(fired >= 30,
      s"only $fired/150 queries substituted — the fuzz space stopped " +
        "exercising the rule (generator drift?)")
  }
}
