package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** SURVEY.md §2 D: the join family.
  *
  * Scale notes (100 TB): dimension sides (region, nation, the derived
  * interval table) are explicitly `broadcast()` — at 1000 executors a
  * shuffled join on a 25-row dim would be pure overhead. The fact
  * joins (orders⋈lineitem) stay shuffled on their keys and AQE picks
  * SMJ/SHJ + handles skew. The interval/as-of joins broadcast the
  * (small, per-entity) metadata side so the probe is a map-side
  * nested-loop over co-partitioned rows, never a cartesian shuffle.
  */
object JoinQueries {

  private val RevenueExpr =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |     (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |     AS DECIMAL(18,4))""".stripMargin

  /** Purchase-validity intervals per user: [purchase ts, next purchase
    * ts) — the IfRef temporal-metadata analog [pub: esxsnmp/sql.py
    * IfRef begin_time/end_time — unverified, SURVEY.md §0]. */
  private val IntervalsSql =
    """iv AS (
      |  SELECT user_id, event_id AS iv_id, epoch_us(ts) AS b_us,
      |         coalesce(lead(epoch_us(ts)) OVER (
      |             PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
      |           9223372036854775807) AS e_us
      |  FROM events WHERE event_type = 'purchase'
      |)""".stripMargin

  private def intervals(s: org.apache.spark.sql.SparkSession, d: String) = {
    val w = Window.partitionBy("user_id").orderBy("b_us", "iv_id")
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("iv_id"),
        unix_micros(col("ts")).as("b_us"))
      .withColumn("e_us", coalesce(lead("b_us", 1).over(w), lit(Long.MaxValue)))
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_join_broadcast",
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    },

    QueryDef("q_join_shuffle",
      s"""SELECT o_orderkey, count(*) AS n_items,
         |  CAST(sum($RevenueExpr) AS DOUBLE) AS revenue
         |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(expr(RevenueExpr)).cast("double").as("revenue"))
        .orderBy("o_orderkey")
    },

    QueryDef("q_join_outer",
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },

    QueryDef("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    QueryDef("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    QueryDef("q_join_range_ifref",
      s"""WITH $IntervalsSql
         |SELECT e.event_id, iv.iv_id
         |FROM events e JOIN iv ON e.user_id = iv.user_id
         |  AND epoch_us(e.ts) >= iv.b_us AND epoch_us(e.ts) < iv.e_us
         |WHERE e.event_type = 'click'
         |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      graft.operators.JoinOps.intervalJoin(ev, intervals(s, d),
          "user_id", "ts_us", "b_us", "e_us")
        .select(col("event_id"), col("iv_id"))
        .orderBy("event_id")
    },

    QueryDef("q_join_asof",
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT e.event_id, p.p_id,
        |         row_number() OVER (PARTITION BY e.event_id
        |             ORDER BY p.p_ts_us DESC NULLS LAST, p.p_id DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN p ON p.user_id = e.user_id
        |    AND p.p_ts_us <= epoch_us(e.ts)
        |  WHERE e.event_type = 'click'
        |)
        |SELECT event_id, p_id FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val clicks = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          unix_micros(col("ts")).as("p_ts_us"))
      val w = Window.partitionBy("event_id")
        .orderBy(col("p_ts_us").desc_nulls_last, col("p_id").desc_nulls_last)
      clicks.join(broadcast(p),
          col("p_user") === col("user_id") && col("p_ts_us") <= col("ts_us"), "left")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("event_id", "p_id")
        .orderBy("event_id")
    },

    QueryDef("q_join_asof_nearest",
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT e.event_id, p.p_id,
        |         row_number() OVER (PARTITION BY e.event_id
        |             ORDER BY abs(p.p_ts_us - epoch_us(e.ts)) ASC NULLS LAST,
        |                      p.p_ts_us ASC NULLS LAST,
        |                      p.p_id ASC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN p ON p.user_id = e.user_id
        |    AND abs(p.p_ts_us - epoch_us(e.ts)) <= 3600000000
        |  WHERE e.event_type = 'click'
        |)
        |SELECT event_id, p_id FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // NEAREST-direction as-of (q_join_asof is backward; forward is
      // the mirror): closest right row by |Δt| within a 1 h tolerance,
      // ties broken toward the EARLIER timestamp then id. The
      // tolerance is what makes nearest scale — it bounds the
      // candidate band per left row, where an unbounded nearest must
      // search both directions arbitrarily far
      val clicks = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          unix_micros(col("ts")).as("p_ts_us"))
      val dist = abs(col("p_ts_us") - col("ts_us"))
      val w = Window.partitionBy("event_id")
        .orderBy(dist.asc_nulls_last, col("p_ts_us").asc_nulls_last,
          col("p_id").asc_nulls_last)
      clicks.join(broadcast(p),
          col("p_user") === col("user_id") && dist <= 3600000000L, "left")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("event_id", "p_id")
        .orderBy("event_id")
    },

    QueryDef("q_join_asof_merge",
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT e.event_id, p.p_id,
        |         row_number() OVER (PARTITION BY e.event_id
        |             ORDER BY p.p_ts_us DESC NULLS LAST, p.p_id DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN p ON p.user_id = e.user_id
        |    AND p.p_ts_us <= epoch_us(e.ts)
        |  WHERE e.event_type = 'click'
        |)
        |SELECT event_id, p_id FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // SAME oracle as q_join_asof, different physics: the native
      // co-partitioned merge operator (graft.plans.AsofJoin via
      // SparkSessionExtensions) — no broadcast, no (left × earlier-
      // right) pair blow-up; the scale path when the metadata side
      // outgrows broadcast reach. Tie pin: max p_id on equal ts,
      // matching the oracle's DESC/DESC pick-first.
      import graft.operators.JoinOps
      val clicks = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          unix_micros(col("ts")).as("p_ts_us"))
      JoinOps.asofJoinMerge(clicks, p,
          leftKey = "user_id", leftTs = "ts_us",
          rightKey = "p_user", rightTs = "p_ts_us", rightTie = "p_id")
        .select("event_id", "p_id")
        .orderBy("event_id")
    },

    {
      // ONE SQL text, both engines: Spark runs it via spark.sql over
      // registered views, DuckDB as the oracle — the TPC-H Q5 shape
      // exercising the optimizer's join-order + broadcast choices on a
      // 5-table tree.
      val q5 =
        """SELECT n_name,
          |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
          |      AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |  CAST(count(*) AS BIGINT) AS n_rows
          |FROM customer
          |JOIN orders ON o_custkey = c_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN nation ON n_nationkey = c_nationkey
          |JOIN region ON r_regionkey = n_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY n_name ORDER BY n_name""".stripMargin
      QueryDef("q_sql_q5", q5) { (s, d) =>
        graft.Tables.registerAll(s, d)
        s.sql(q5)
      }
    },

    {
      // window functions through the SQL-TEXT surface (round 10 —
      // the q_sql_* family had joins/subqueries/HAVING but no window):
      // per-customer top-3 orders by price via rank() in ONE text both
      // engines parse — same WINDOW syntax, same exact-cents ordering
      // key with the unique o_orderkey tiebreak, rank cast to BIGINT
      // so the dtype matches pandas-side
      val q =
        """WITH r AS (
          |  SELECT o_custkey, o_orderkey,
          |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
          |    rank() OVER (PARTITION BY o_custkey
          |                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
          |                          o_orderkey) AS rk
          |  FROM orders
          |)
          |SELECT o_custkey, o_orderkey, cents, CAST(rk AS BIGINT) AS rk
          |FROM r WHERE rk <= 3
          |ORDER BY o_custkey, rk, o_orderkey""".stripMargin
      // round 18: the Spark-side builder mirrors the oracle text in the
      // DataFrame API so it can range-partition by o_custkey BELOW the
      // window. RangePartitioning(o_custkey) satisfies both the
      // window's ClusteredDistribution AND the final ORDER BY's
      // (o_custkey, …) prefix (OrderedDistribution prefix rule), so the
      // query plans ONE exchange whose boundary sampling reads the bare
      // projected scan — before, the final sort's own Exchange
      // rangepartitioning re-executed the whole rank window for
      // sampling (driver r17: 5.7 s at 32 cores vs 1.4 s at 8; guide
      // §1/§2.4). The same shape expressed through s.sql() with a
      // REPARTITION_BY_RANGE hint still planned the second exchange
      // (measured, Spark 4.1), so this one query builds via the DF API;
      // the rank cast projects ABOVE the final sort (int vs bigint rank
      // sort identically). Every expression is textually the oracle's.
      QueryDef("q_sql_window", q) { (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("cents").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .repartitionByRange(col("o_custkey"))
          .withColumn("rk", rank().over(w))
          .filter(col("rk") <= 3)
          .orderBy("o_custkey", "rk", "o_orderkey")
          .select(col("o_custkey"), col("o_orderkey"), col("cents"),
            col("rk").cast("bigint").as("rk"))
      }
    },

    {
      // correlated scalar subquery — Catalyst decorrelates it into a
      // join against the per-nation aggregate; same text both engines
      // avg over exact cents: integer sum + one division is the same
      // double in both engines; avg over raw doubles would be
      // summation-order-dependent under partial aggregation
      val q =
        """SELECT c_custkey, c_name, c_acctbal
          |FROM customer c
          |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) >
          |      (SELECT avg(CAST(round(c2.c_acctbal * 100) AS BIGINT))
          |       FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin
      QueryDef("q_sql_scalar_subq", q) { (s, d) =>
        graft.Tables.registerAll(s, d)
        s.sql(q)
      }
    },

    {
      // GROUP BY + HAVING over an aggregate — Catalyst folds the HAVING
      // predicate into a post-agg Filter; ONE SQL text, both engines
      val q =
        """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM orders GROUP BY o_custkey
          |HAVING count(*) >= 10
          |ORDER BY o_custkey""".stripMargin
      QueryDef("q_sql_having", q) { (s, d) =>
        graft.Tables.registerAll(s, d)
        s.sql(q)
      }
    },

    {
      // uncorrelated IN-subquery — rewritten to a left-semi join
      val q =
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
          |                      WHERE n_name LIKE 'NATION_1%')
          |ORDER BY c_custkey""".stripMargin
      QueryDef("q_sql_in_subq", q) { (s, d) =>
        graft.Tables.registerAll(s, d)
        s.sql(q)
      }
    },

    {
      // correlated NOT EXISTS — rewritten to a left-anti join (the
      // dual of q_join_semi's EXISTS, through the SQL text path)
      val q =
        """SELECT s_suppkey, s_name FROM supplier
          |WHERE NOT EXISTS (SELECT 1 FROM lineitem
          |                  WHERE l_suppkey = s_suppkey
          |                    AND l_quantity > 49 AND l_tax > 0.07)
          |ORDER BY s_suppkey""".stripMargin
      QueryDef("q_sql_not_exists", q) { (s, d) =>
        graft.Tables.registerAll(s, d)
        s.sql(q)
      }
    },

    QueryDef("q_join_full_outer",
      """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nk,
        |  CAST(coalesce(c.n_cust, 0) AS BIGINT) AS n_cust,
        |  CAST(coalesce(s.n_supp, 0) AS BIGINT) AS n_supp
        |FROM c FULL OUTER JOIN s ON s.nk = c.nk
        |ORDER BY nk""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("snk") === col("nk"), "full_outer")
        .select(coalesce(col("nk"), col("snk")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    },

    QueryDef("q_null_semantics",
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'P'), 'pending?') AS status_or_default,
        |  o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f_nullsafe,
        |  CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_or_neg
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).selectExpr("o_orderkey",
          "coalesce(nullif(o_orderstatus, 'P'), 'pending?') AS status_or_default",
          "o_orderstatus <=> 'F' AS is_f_nullsafe",
          "CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_or_neg")
        .orderBy("o_orderkey")
    },

    QueryDef("q_join_cross",
      """SELECT r_regionkey, n_nationkey, r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin) { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_regionkey", "n_nationkey", "r_name", "n_name")
        .orderBy("r_regionkey", "n_nationkey")
    },

    QueryDef("q_join_salted",
      """SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_nationkey
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
      // the skew toolkit on the declared surface: a hot key (one chatty
      // customer) would pin a plain shuffle join on one task; salting
      // splits every key across 8 subtasks with a deterministic salt.
      // The oracle is the PLAIN join — salting must be invisible in the
      // result, which is exactly the property that makes it safe to
      // deploy at 100 TB (JoinOpsSpec proves it row-for-row too)
      val fact = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_nationkey"))
      graft.operators.JoinOps
        .saltedEquiJoin(fact, dim, "o_custkey", col("o_orderkey"), nSalts = 8)
        .select("o_orderkey", "o_custkey", "c_name", "c_nationkey")
        .orderBy("o_orderkey")
    },

    QueryDef("q_join_interval_overlap",
      """WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
        |           FROM events),
        |g AS (SELECT user_id, event_type, ts_us, event_id,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |               OR ts_us - lag(ts_us) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM s WINDOW w AS (PARTITION BY user_id, event_type
        |                          ORDER BY ts_us, event_id)),
        |i AS (SELECT user_id, event_type, ts_us,
        |        sum(new_sess) OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM g),
        |sess AS (SELECT user_id, event_type, sess_id,
        |           min(ts_us) AS s, max(ts_us) AS e
        |         FROM i GROUP BY 1, 2, 3)
        |SELECT a.event_type, a.user_id AS a_user,
        |  CAST(a.sess_id AS BIGINT) AS a_sess,
        |  b.user_id AS b_user, CAST(b.sess_id AS BIGINT) AS b_sess,
        |  CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
        |FROM sess a JOIN sess b
        |  ON a.event_type = b.event_type AND a.user_id < b.user_id
        |  AND a.s <= b.e AND b.s <= a.e
        |ORDER BY a.event_type, a_user, a_sess, b_user, b_sess""".stripMargin) { (s, d) =>
      // INTERVAL-OVERLAP join — the temporal shape the point-in-interval
      // forms (q_join_range_ifref, as-of) don't cover: which session
      // intervals of DIFFERENT users overlap in time, per metric
      // ("who was on the network together"). The oracle states the pure
      // overlap predicate; the Spark plan BINS each interval onto the
      // 6 h slots it covers and equi-joins on (metric, slot) — the
      // standard distributed interval-join recipe: candidate pairs meet
      // only inside a shared slot (a pair spanning two slots meets
      // twice -> distinct), so there is no all-pairs stage anywhere and
      // skew is bounded by interval length / slot width. At 100 TB the
      // slot width tunes the replication-vs-selectivity trade exactly
      // like the jaccard grid's subBlocks
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val run = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("new_sess",
          when(lag("ts_us", 1).over(w).isNull ||
            col("ts_us") - lag("ts_us", 1).over(w) > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "event_type", "sess_id")
        .agg(min("ts_us").as("s"), max("ts_us").as("e"))
      // bin width = the session gap (30 min): any two overlapping
      // intervals share a slot at EVERY width (a slot containing a
      // point of the intersection is covered by both), so width only
      // tunes replication-vs-cell-density — 30 min cells hold ~10x
      // fewer intervals than 6 h cells at this session length profile
      // (sf0.1: 4.0 s -> sub-second candidate stage)
      val slotUs = 1800000000L
      def binned(side: DataFrame, p: String): DataFrame = side.select(
        col("event_type"), col("user_id").as(s"${p}_user"),
        col("sess_id").as(s"${p}_sess"), col("s").as(s"${p}_s"),
        col("e").as(s"${p}_e"),
        explode(expr(s"sequence(s div $slotUs, e div $slotUs)")).as("slot"))
      binned(sess, "a").join(binned(sess, "b"), Seq("event_type", "slot"))
        .filter(col("a_user") < col("b_user") &&
          col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select(col("event_type"), col("a_user"), col("a_sess"),
          col("b_user"), col("b_sess"),
          (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
            .as("overlap_us"))
        .distinct()
        .orderBy("event_type", "a_user", "a_sess", "b_user", "b_sess")
    }
  )
}
