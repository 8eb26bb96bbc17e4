package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-way skew-join timing (VERDICT r10 missing #2): the SAME
  * hot-key equi-join measured (1) plain with AQE skew-split on,
  * (2) plain with AQE off — the straggler baseline, and (3) manually
  * salted with AQE off. BASELINE.md records a run; SkewJoinSpec pins
  * the plan shapes (split fires; a same-key groupBy defeats it).
  *
  * Fixture: `rows` fact rows, `hotFrac` of them on ONE key, the rest
  * uniform over `nKeys`; dim = one row per key, forced past broadcast
  * (autoBroadcastJoinThreshold = -1) so the join genuinely shuffles.
  * The timed action folds both sides' payloads so neither scan prunes
  * away.
  *
  * Run:  sbt "runMain graft.SkewBench [rows] [nKeys] [hotPermille] [reps]"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nKeys = if (args.length > 1) args(1).toLong else 100000L
    val hotPermille = if (args.length > 2) args(2).toInt else 600
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fact: DataFrame = spark.range(rows).select(
      when(col("id") % 1000 < hotPermille, lit(0L))
        .otherwise(col("id") % nKeys).as("k"),
      col("id").as("v"))
    def dim: DataFrame = spark.range(nKeys)
      .select(col("id").as("k"), (col("id") * 2).as("w"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def act(df: DataFrame): Unit = { df.agg(sum(col("v") + col("w"))).collect(): Unit }

    def withConfs[A](kv: (String, String)*)(body: => A): A =
      Util.withConfs(spark)(kv: _*)(body)

    // one untimed warmup of each side's generation + shuffle machinery
    act(fact.join(dim, "k"))

    def minOf(f: => Double): Double = (1 to reps).map(_ => f).min

    val defaultConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true")
    // the tuned arm: thresholds sized to THIS fixture's hot partition
    // (range-generated longs compress hard, so even tens of millions
    // of hot rows sit under the 256 MB default threshold — exactly the
    // regime a user must know about)
    val tunedConfs = defaultConfs ++ Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> (32L << 20).toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (16L << 20).toString)

    def fired(confs: Seq[(String, String)]): Boolean = withConfs(confs: _*) {
      val df = fact.join(dim, "k").agg(sum(col("v") + col("w")))
      df.collect()
      df.queryExecution.executedPlan.toString.contains("skew=true")
    }

    val aqeDefault = minOf(time(withConfs(defaultConfs: _*) {
      act(fact.join(dim, "k"))
    }))
    val aqeTuned = minOf(time(withConfs(tunedConfs: _*) {
      act(fact.join(dim, "k"))
    }))
    val aqeOff = minOf(time(withConfs(
        "spark.sql.adaptive.enabled" -> "false") {
      act(fact.join(dim, "k"))
    }))
    val salted = minOf(time(withConfs(
        "spark.sql.adaptive.enabled" -> "false") {
      act(graft.operators.JoinOps.saltedEquiJoin(
        fact, dim, "k", saltFrom = col("v"), nSalts = cpus.toInt))
    }))

    println(s"""{"metric":"skew_join","rows":$rows,"nKeys":$nKeys,""" +
      s""""hotPermille":$hotPermille,"reps":$reps,""" +
      s""""aqe_default_sec":$aqeDefault,"aqe_tuned_sec":$aqeTuned,""" +
      s""""no_aqe_sec":$aqeOff,"salted_sec":$salted,""" +
      s""""aqe_default_fired":${fired(defaultConfs)},""" +
      s""""aqe_tuned_fired":${fired(tunedConfs)}}""")
    spark.stop()
  }
}
