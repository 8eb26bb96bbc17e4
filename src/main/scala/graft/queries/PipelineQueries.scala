package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables, Util}
import graft.functions.{TopKByValue, TopKEntry}
import graft.operators.{DedupOps, MultimodalOps, TextOps}

/** SURVEY.md §2 M (round 2): the operations a large-scale
  * training-data pipeline runs between raw corpus and training shards —
  * deterministic sampling, stratified sampling, weighted source mixing,
  * document chunking, sequence packing, repetition-quality scoring,
  * dedup cluster resolution, and the exact-sum correlation/covariance
  * surface.
  *
  * Determinism strategy: sampling decisions use a Knuth multiplicative
  * hash over BIGINT ids — exact integer arithmetic, identical in any
  * engine, reproducible across cluster sizes and partitionings (unlike
  * rand(seed), whose stream depends on the partitioning). */
object PipelineQueries {

  /** (id * 2654435761) masked to the low 32 bits — Knuth multiplicative
    * hash, exact in BIGINT. Sampling keeps `hkey < rate * 2^32`.
    * The mask (not `% 2^32`, ADVICE r2) removes the Spark-side failure
    * mode for doc_id > ~3.47e9: the wrapped product's `%` went negative
    * and silently passed every `hkey < thr` gate (biased
    * over-sampling), while AND of the wrap is still the true low 32
    * bits, non-negative. Cross-engine the gate is identical for
    * doc_id < ~3.47e9; beyond that DuckDB errors on the multiply
    * itself (BIGINT overflow) — loud, not silently divergent. */
  private val HKey = "(doc_id * 2654435761) & 4294967295"

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_sample_hash",
      s"""SELECT doc_id, lang, $HKey AS hkey
         |FROM documents
         |WHERE $HKey < 858993459
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // 20% deterministic sample: 858993459 = floor(0.2 * 2^32).
      // Hash-gating beats rand(seed) at scale: the decision is a pure
      // function of the row, so re-runs, retries, and repartitions
      // cannot change the sample.
      Tables.documents(s, d)
        .selectExpr("doc_id", "lang", s"$HKey AS hkey")
        .filter(col("hkey") < 858993459L)
        .orderBy("doc_id")
    },

    QueryDef("q_sample_stratified",
      s"""WITH h AS (SELECT doc_id, lang, $HKey AS hkey FROM documents),
         |r AS (SELECT doc_id, lang, hkey,
         |        row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY lang) AS n
         |      FROM h)
         |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
         |FROM r WHERE rn <= CAST(ceil(0.25 * n) AS BIGINT)
         |ORDER BY lang, rn""".stripMargin) { (s, d) =>
      // exact 25% per language stratum: rank docs inside each stratum
      // by hash key (deterministic shuffle order), keep the first
      // ceil(0.25·n). One window pass; the strata partition the data
      // so this parallelizes per-language at any scale.
      val w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
      Tables.documents(s, d)
        .selectExpr("doc_id", "lang", s"$HKey AS hkey")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
        .filter(col("rn") <= ceil(lit(0.25) * col("n")).cast("long"))
        .select(col("doc_id"), col("lang"), col("rn").cast("bigint").as("rn"))
        .orderBy("lang", "rn")
    },

    QueryDef("q_mix_weighted",
      s"""WITH k AS (
         |  SELECT source, doc_id, $HKey AS hkey,
         |    CASE WHEN source IN ('src0','src1','src2') THEN 3435973836
         |         WHEN source IN ('src3','src4','src5') THEN 2147483648
         |         ELSE 1073741824 END AS thr
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(count(CASE WHEN hkey < thr THEN 1 END) AS BIGINT) AS n_kept
         |FROM k GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      // weighted dataset mixing: per-source keep rates (0.8/0.5/0.25)
      // applied by the same hash gate — the mixture recipe a training
      // run pins in its data card, reproducible at any scale
      Tables.documents(s, d)
        .selectExpr("source", "doc_id", s"$HKey AS hkey",
          """CASE WHEN source IN ('src0','src1','src2') THEN 3435973836
            |     WHEN source IN ('src3','src4','src5') THEN 2147483648
            |     ELSE 1073741824 END AS thr""".stripMargin)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("hkey") < col("thr"), 1)).as("n_kept"))
        .orderBy("source")
    },

    QueryDef("q_mix_temperature",
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |z AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list(sqrt(CAST(n AS DOUBLE)) ORDER BY source)),
        |        (a, x) -> a + x) AS z FROM c)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  round(sqrt(CAST(n AS DOUBLE)) / z.z, 6) AS p
        |FROM c, z ORDER BY source""".stripMargin) { (s, d) =>
      // temperature-based mixture weights (p_i ∝ n_i^α, α = 0.5 — the
      // standard multilingual/multi-source upsampling curve): exact
      // integer counts per source; the normalizer is a SEQUENTIAL fold
      // over the source-ordered weight list (§7.4 — a parallel double
      // sum would be partial-agg-order dependent), which is fine
      // because the fold is over n_sources values, not rows. The final
      // 1-row normalizer joins back by broadcast.
      val counts = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n"))
      val tot = counts.agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("source"), col("n")))),
            x => sqrt(x("n").cast("double"))),
          lit(0.0), (a, x) => a + x).as("z"))
      counts.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          round(sqrt(col("n").cast("double")) / col("z"), 6).as("p"))
        .orderBy("source")
    },

    QueryDef("q_mix_capped",
      s"""WITH pool AS (SELECT doc_id, source, $HKey AS hkey
         |              FROM documents WHERE n_chars >= 300),
         |av AS (SELECT source, count(*) AS avail FROM pool GROUP BY 1),
         |a1 AS (SELECT source, avail, least(avail, 6) AS a1 FROM av),
         |t AS (SELECT 120 - sum(a1) AS l, sum(avail - a1) AS r FROM a1),
         |al AS (SELECT source, avail,
         |         a1 + CASE WHEN t.r = 0 THEN 0
         |              ELSE least(avail - a1, (t.l * (avail - a1)) // t.r) END AS alloc
         |       FROM a1 CROSS JOIN t),
         |rk AS (SELECT doc_id, pool.source, row_number() OVER
         |         (PARTITION BY pool.source ORDER BY hkey, doc_id) AS rn, alloc
         |       FROM pool JOIN al ON al.source = pool.source)
         |SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
         |FROM rk WHERE rn <= alloc ORDER BY source, rn""".stripMargin) { (s, d) =>
      // budgeted domain mixing with per-domain caps + one-pass
      // water-fill (the Pile/DoReMi-style sampling shape): each source
      // gets min(avail, B/|D|) docs; budget stranded in scarce domains
      // redistributes to unsaturated ones proportionally to remaining
      // capacity — ALL allocation math is exact integer arithmetic
      // (least/floor-div on counts, no float proportions to diverge
      // cross-engine). Selection within a domain is the deterministic
      // hash order (re-run/retry/partitioning-proof); the per-domain
      // allocation table is tiny and broadcasts onto the pool
      val pool = Tables.documents(s, d).filter(col("n_chars") >= 300)
        .selectExpr("doc_id", "source", s"$HKey AS hkey")
      val a1 = pool.groupBy("source").agg(count(lit(1)).as("avail"))
        .withColumn("a1", least(col("avail"), lit(6L)))
      val t = a1.agg((lit(120L) - sum(col("a1"))).as("l"),
        sum(col("avail") - col("a1")).as("r"))
      val al = a1.crossJoin(broadcast(t))
        .withColumn("alloc", col("a1") + when(col("r") === 0, lit(0L))
          .otherwise(least(col("avail") - col("a1"),
            expr("(l * (avail - a1)) div r"))))
        .select("source", "alloc")
      val w = Window.partitionBy("source").orderBy("hkey", "doc_id")
      pool.join(broadcast(al), "source")
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= col("alloc"))
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy("source", "rn")
    },

    QueryDef("q_doc_chunk",
      """WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |st AS (SELECT doc_id, arr, unnest(range(1, len(arr) + 1, 40)) AS start FROM arrs)
        |SELECT doc_id, CAST((start - 1) // 40 AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(arr, start, start + 49)) AS BIGINT) AS n_tok,
        |  array_to_string(list_slice(arr, start, start + 49), ' ') AS chunk
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      // sliding-window chunking (size 50 tokens, stride 40 → overlap
      // 10): the doc→context-window step. explode(sequence) is the
      // Generator path — no driver loop, parallel over docs
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("arr"))
        .select(col("doc_id"), col("arr"),
          explode(expr("sequence(1, size(arr), 40)")).as("start"))
        .selectExpr("doc_id",
          "CAST((start - 1) div 40 AS BIGINT) AS chunk_id",
          "CAST(size(slice(arr, start, 50)) AS BIGINT) AS n_tok",
          "array_join(slice(arr, start, 50), ' ') AS chunk")
        .orderBy("doc_id", "chunk_id")
    },

    QueryDef("q_pack_greedy",
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS filled
        |  FROM t)
        |SELECT doc_id, source, n_tok, CAST(filled // 512 AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      // sequence packing: docs fill 512-token bins in id order within
      // their source shard — bin = tokens-before // capacity. Shard-
      // local packing (PARTITION BY source) is what scales: a global
      // pack order would serialize the corpus through one window
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .selectExpr("doc_id", "source",
          "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok")
        .withColumn("filled", sum("n_tok").over(w) - col("n_tok"))
        .selectExpr("doc_id", "source", "n_tok",
          "CAST(filled div 512 AS BIGINT) AS bin")
        .orderBy("doc_id")
    },

    QueryDef("q_text_repetition",
      """WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |tri AS (SELECT doc_id, unnest(list_transform(range(1, len(arr) - 1),
        |    i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS tr
        |  FROM arrs WHERE len(arr) >= 3),
        |g AS (SELECT doc_id, tr, count(*) AS c FROM tri GROUP BY doc_id, tr),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
        |        CAST(count(*) AS BIGINT) AS n_uniq, CAST(max(c) AS BIGINT) AS max_rep
        |  FROM g GROUP BY doc_id)
        |SELECT doc_id, n_tri, n_uniq, max_rep,
        |  round(CAST(1 AS DOUBLE) - CAST(n_uniq AS DOUBLE) / CAST(n_tri AS DOUBLE), 4) AS rep_ratio
        |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
      // repetition quality signal: duplicated-trigram ratio + the most
      // repeated trigram's count — the boilerplate/spam filter. Exact
      // integer counts; one double division at the end
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("arr"))
        .filter(size(col("arr")) >= 3)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(arr) - 2),
            |  i -> concat_ws(' ', element_at(arr, i), element_at(arr, i+1),
            |                      element_at(arr, i+2)))""".stripMargin)).as("tr"))
        .groupBy("doc_id", "tr").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tri"), count(lit(1)).as("n_uniq"), max("c").as("max_rep"))
        .selectExpr("doc_id", "n_tri", "n_uniq", "max_rep",
          "round(CAST(1 AS DOUBLE) - CAST(n_uniq AS DOUBLE) / CAST(n_tri AS DOUBLE), 4) AS rep_ratio")
        .orderBy("doc_id")
    },

    QueryDef("q_agg_corr",
      """WITH t AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y FROM documents),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
        |    sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM t GROUP BY lang)
        |SELECT lang, n,
        |  round(CAST(CAST(n*sxy - sx*sy AS STRING) AS DOUBLE) /
        |    (sqrt(CAST(CAST(n*sxx - sx*sx AS STRING) AS DOUBLE)) * sqrt(CAST(CAST(n*syy - sy*sy AS STRING) AS DOUBLE))), 4) AS corr_xy,
        |  round(CAST(CAST(n*sxy - sx*sy AS STRING) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE), 4) AS covar_xy
        |FROM a ORDER BY lang""".stripMargin) { (s, d) =>
      // corr/covar from exact integer moment sums — order-insensitive
      // under partial aggregation, unlike the built-in streaming corr
      // whose double accumulators are merge-order-dependent (§7.4).
      // Sums accumulate in DECIMAL(38,0) (the §7.4 group-size rule,
      // round 12): per-term products fit int64 but per-LANG sums and
      // the n·sxy − sx·sy products grow with corpus size — decimal
      // mirrors the oracle's HUGEINT arithmetic exactly to ~1e38
      Tables.documents(s, d)
        .selectExpr("lang", "CAST(n_chars AS BIGINT) AS x",
          "CAST(size(split(text, ' ')) AS BIGINT) AS y")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
        .selectExpr("lang", "n",
          """round(CAST(CAST(n*sxy - sx*sy AS STRING) AS DOUBLE) /
            |  (sqrt(CAST(CAST(n*sxx - sx*sx AS STRING) AS DOUBLE)) * sqrt(CAST(CAST(n*syy - sy*sy AS STRING) AS DOUBLE))), 4) AS corr_xy""".stripMargin,
          "round(CAST(CAST(n*sxy - sx*sy AS STRING) AS DOUBLE) / CAST(n*(n-1) AS DOUBLE), 4) AS covar_xy")
        .orderBy("lang")
    },

    QueryDef("q_unpivot",
      """SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin) { (s, d) =>
      // wide→long reshape via stack (the Generator-based unpivot):
      // one scan, no join — the UNION ALL oracle text is the
      // semantic spec, not the plan
      // round 18 (guide §2.3/§2.4): range-partition the NARROW scan by
      // (l_orderkey, l_linenumber) BELOW the stack generator.
      // RangePartitioning on that prefix satisfies the final ORDER BY
      // (…, measure) — Generate preserves partitioning — so the sort is
      // local and the old top Exchange rangepartitioning is gone. That
      // exchange shuffled the 3x-exploded long rows and its boundary
      // sampling re-executed scan+stack; now the one exchange carries
      // 1x rows of 5 narrow columns and sampling re-reads only the scan.
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount")
        .repartitionByRange(col("l_orderkey"), col("l_linenumber"))
        .selectExpr("l_orderkey", "l_linenumber",
          """stack(3, 'quantity', l_quantity,
            |         'extendedprice', l_extendedprice,
            |         'discount', l_discount) AS (measure, val)""".stripMargin)
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    QueryDef("q_window_first_last",
      """SELECT event_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
        |  nth_value(value, 2) OVER w AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val grow = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("event_id"),
          first("value").over(grow).as("first_v"),
          last("value").over(full).as("last_v"),
          nth_value(col("value"), 2).over(grow).as("second_v"))
        .orderBy("event_id")
    },

    QueryDef("q_agg_minby_maxby",
      """SELECT event_type,
        |  min_by(value, event_id) AS first_value,
        |  max_by(value, event_id) AS last_value,
        |  CAST(min(event_id) AS BIGINT) AS first_id,
        |  CAST(max(event_id) AS BIGINT) AS last_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // arg-min/arg-max keyed on the UNIQUE event_id (value of the
      // earliest/latest event per type) — unique ordering key keeps
      // min_by deterministic under parallel merge
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(expr("min_by(value, event_id)").as("first_value"),
          expr("max_by(value, event_id)").as("last_value"),
          min("event_id").as("first_id"), max("event_id").as("last_id"))
        .orderBy("event_type")
    },

    QueryDef("q_stream_join",
      """WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, p.purchase_id
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND p.ts_us >= c.ts_us AND p.ts_us < c.ts_us + 3600000000
        |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
      // batch twin of the stream-stream interval join (purchases within
      // 1 h after a click, same user) — the streaming form with
      // watermarks on both sides is StreamingOpsSpec territory
      val c = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("c_ts"))
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          unix_micros(col("ts")).as("p_ts"))
      c.join(p, col("p_user") === col("user_id") &&
          col("p_ts") >= col("c_ts") && col("p_ts") < col("c_ts") + 3600000000L)
        .select("click_id", "purchase_id")
        .orderBy("click_id", "purchase_id")
    },

    QueryDef("q_dedup_cluster",
      """WITH RECURSIVE
        |arrs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |shd AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(arr) - 1),
        |        i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS sh
        |    FROM arrs WHERE len(arr) >= 3) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        |ix AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        |       FROM shd a JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |       GROUP BY a.doc_id, b.doc_id),
        |e AS (SELECT a_id, b_id FROM ix
        |      JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        |      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5),
        |und AS (SELECT a_id AS u, b_id AS v FROM e
        |        UNION SELECT b_id, a_id FROM e),
        |reach(u, v) AS (SELECT u, v FROM und
        |  UNION SELECT r.u, d.v FROM reach r JOIN und d ON d.u = r.v),
        |m AS (SELECT u AS node, least(u, min(v)) AS cluster FROM reach GROUP BY u)
        |SELECT d.doc_id, CAST(coalesce(m.cluster, d.doc_id) AS BIGINT) AS cluster
        |FROM documents d LEFT JOIN m ON m.node = d.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      // dedup cluster resolution: near-dup PAIRS (Jaccard ≥ 0.5) →
      // transitive components → cluster id = min doc_id in component.
      // Spark side: iterative min-label propagation (DedupOps), a
      // shuffle-bounded fixpoint; the oracle's recursive CTE computes
      // the same fixpoint by transitive closure
      val docs = Tables.documents(s, d)
      val edges = TextOps.jaccardPairs(docs, 3, 0.5).select("a_id", "b_id")
      val nodes = docs.select(col("doc_id").as("node"))
      DedupOps.connectedComponents(nodes, edges)
        .select(col("node").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    },

    QueryDef("q_topk_heap",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, o_totalprice, rn FROM r WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      // SAME oracle as q_topk_per_group, different physics: the typed
      // bounded-heap Aggregator keeps ≤k rows per group per partition
      // (partial/final two-phase, like sum), so the shuffle carries
      // k·groups rows — the window form shuffles the ENTIRE table
      import s.implicits._
      val top3 = new TopKByValue(3).toColumn
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(t => TopKEntry(t._2, t._3))
        .agg(top3)
        .flatMap { case (ck, tops) =>
          tops.zipWithIndex.map { case (e, i) => (ck, e.id, e.v, (i + 1).toLong) }
        }
        .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    QueryDef("q_dedup_editdist",
      """WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |shd AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(arr) - 1),
        |        i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS sh
        |    FROM arrs WHERE len(arr) >= 3) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
        |ix AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        |       FROM shd a JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |       GROUP BY a.doc_id, b.doc_id),
        |e AS (SELECT a_id, b_id FROM ix
        |      JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
        |      WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5)
        |SELECT e.a_id, e.b_id,
        |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
        |FROM e JOIN documents da ON da.doc_id = e.a_id
        |       JOIN documents db ON db.doc_id = e.b_id
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // verification pass of the dedup funnel: exact edit distance
      // computed ONLY on candidate pairs (never all-pairs — at 100 TB
      // levenshtein is strictly a post-filter on banding survivors)
      val docs = Tables.documents(s, d)
      TextOps.jaccardPairs(docs, 3, 0.5).select("a_id", "b_id")
        .join(docs.select(col("doc_id").as("a_id"), col("text").as("a_text")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("text").as("b_text")), "b_id")
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_text"), col("b_text")).cast("bigint").as("dist"))
        .orderBy("a_id", "b_id")
    },

    QueryDef("q_funnel",
      """WITH s AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(count(t_view) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_click_after_view,
        |  CAST(count(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 END) AS BIGINT) AS n_full_funnel
        |FROM s""".stripMargin) { (s, d) =>
      // ordered conversion funnel (view → click → purchase): first-
      // touch timestamps per user via conditional min (one shuffle),
      // stage predicates enforce ordering — no self-joins, no windows
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
          min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_buy"))
        .agg(
          count(col("t_view")).as("n_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("n_click_after_view"),
          count(when(col("t_buy") > col("t_click") && col("t_click") > col("t_view"), 1))
            .as("n_full_funnel"))
    },

    QueryDef("q_ts_anomaly",
      Tables.MeasurementsSql +
      """,
        |st AS (
        |  SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS n, sum(cents) AS s1, sum(CAST(cents AS HUGEINT)*cents) AS s2
        |  FROM m GROUP BY user_id, event_type
        |)
        |SELECT m.event_id, m.user_id, m.event_type,
        |  round((CAST(m.cents AS DOUBLE) - CAST(st.s1 AS DOUBLE) / CAST(st.n AS DOUBLE)) /
        |    sqrt((CAST(st.n AS DOUBLE) * CAST(CAST(st.s2 AS STRING) AS DOUBLE) - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE))
        |         / (CAST(st.n AS DOUBLE) * CAST(st.n - 1 AS DOUBLE))), 3) AS z
        |FROM m JOIN st ON st.user_id = m.user_id AND st.event_type = m.event_type
        |WHERE st.n > 1 AND abs(
        |    (CAST(m.cents AS DOUBLE) - CAST(st.s1 AS DOUBLE) / CAST(st.n AS DOUBLE)) /
        |    sqrt((CAST(st.n AS DOUBLE) * CAST(CAST(st.s2 AS STRING) AS DOUBLE) - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE))
        |         / (CAST(st.n AS DOUBLE) * CAST(st.n - 1 AS DOUBLE)))) > 2.5
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // per-series z-score outliers from EXACT integer moment sums
      // (n, Σc, Σc²) — order-insensitive under partial agg; the tiny
      // per-series stats broadcast back onto the fact table. The
      // identical IEEE expression evaluates both the filter and the
      // reported z, so the threshold cut is bit-deterministic.
      // Σc/Σc² accumulate in DECIMAL(38,0) (the §7.4 group-size rule,
      // round 12): per-term cents² is int64-bounded by |cents| < 3e9,
      // but the per-series SUM grows with history length — decimal
      // matches the oracle's HUGEINT accumulation to ~1e38, and both
      // cast the same exact integer to double
      Util.requireLoudOverflow(s)
      val m = Tables.measurements(s, d)
      val st = m.groupBy(col("user_id").as("su"), col("event_type").as("se"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast("decimal(38,0)")).as("s1"),
          // per-term cents²: int64 by default (|cents| < 3.0e9,
          // ANSI-loud past it), decimal-first under
          // spark.graft.wideMoments (round 13; oracle HUGEINT-first)
          sum(Util.momentProd(s)(col("cents"), col("cents"))).as("s2"))
        .filter(col("n") > 1)
      val z = (col("cents").cast("double") - col("s1").cast("double") / col("n").cast("double")) /
        sqrt((col("n").cast("double") * col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double")) /
          (col("n").cast("double") * (col("n") - 1).cast("double")))
      m.join(broadcast(st),
          col("su") === col("user_id") && col("se") === col("event_type"))
        .filter(abs(z) > 2.5)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(z, 3).as("z"))
        .orderBy("event_id")
    },

    QueryDef("q_typed_cogroup",
      """WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
        |           WHERE event_type = 'click' GROUP BY user_id),
        |p AS (SELECT user_id, count(*) AS n_purchases FROM events
        |      WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |  CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
        |  CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases
        |FROM c FULL OUTER JOIN p ON p.user_id = c.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      // typed KeyValueGroupedDataset.cogroup — the Dataset API's
      // arbitrary two-sided per-key logic (here: side counts; the same
      // surface hosts per-key sessionization/merge logic that SQL
      // can't express). Co-partitions both sides by key, one shuffle
      // each, no join materialization.
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).as[(Long, String)]
      val clicks = ev.filter(_._2 == "click").groupByKey(_._1)
      val purchases = ev.filter(_._2 == "purchase").groupByKey(_._1)
      clicks.cogroup(purchases) { (uid, cs, ps) =>
        val (nc, np) = (cs.size.toLong, ps.size.toLong)
        if (nc == 0 && np == 0) Iterator.empty
        else Iterator((uid, nc, np))
      }.toDF("user_id", "n_clicks", "n_purchases")
        .orderBy("user_id")
    },

    QueryDef("q_multimodal_frames",
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(1 + strlen(text) // 4096 AS BIGINT) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, n_frames, unnest(range(0, n_frames, 10)) AS frame_idx
        |FROM m ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      // frame-sampling plan for the video assets: frame count derives
      // from the deterministic stub decode's n_bytes (= utf-8 bytes of
      // the payload), every-10th-frame sample via a generator — the
      // metadata-only plan a real decoder would execute per frame
      val decoded = MultimodalOps.decode(
        MultimodalOps.asMedia(Tables.documents(s, d), "doc_id", "text")).toDF()
      decoded.filter(col("kind") === "video")
        .selectExpr("media_id", "CAST(1 + n_bytes div 4096 AS BIGINT) AS n_frames")
        .withColumn("frame_idx",
          explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, CAST(10 AS BIGINT))")))
        .select("media_id", "n_frames", "frame_idx")
        .orderBy("media_id", "frame_idx")
    },

    QueryDef("q_pipeline_prep",
      s"""WITH q AS (
         |  SELECT doc_id, source, text,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents WHERE len(string_split(text, ' ')) >= 30
         |),
         |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         |dq AS (SELECT q.* FROM q JOIN k USING (doc_id)),
         |arrs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
         |sh AS (SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(arr) - 1),
         |        i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS sh
         |    FROM arrs WHERE len(arr) >= 3) t),
         |test_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |contaminated AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN test_sh t ON s.sh = t.sh),
         |clean AS (
         |  SELECT dq.* FROM dq
         |  WHERE dq.doc_id % 97 <> 0
         |    AND dq.doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |samp AS (SELECT * FROM clean WHERE $HKey < 2147483648),
         |packed AS (
         |  SELECT doc_id, source, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS filled
         |  FROM samp)
         |SELECT doc_id, source, n_tok, CAST(filled // 512 AS BIGINT) AS bin
         |FROM packed ORDER BY doc_id""".stripMargin) { (s, d) =>
      // the whole training-data prep pipeline as ONE Catalyst DAG —
      // quality gate → exact dedup (keep min id per content hash) →
      // test-split removal + decontamination (broadcast shingle
      // dictionary, anti-join) → deterministic 50% hash sample →
      // per-source-shard 512-token bin packing. Every stage is an
      // already-audited operator; composing them declaratively lets
      // Catalyst fuse the three row-local gates into the scans and
      // prune text columns out after the last consumer. At 100 TB the
      // only shuffles are the content-hash dedup, the shingle
      // dictionary probe's distinct, and the per-source pack window
      val docs = Tables.documents(s, d)
      val q = docs
        .selectExpr("doc_id", "source", "text",
          "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok")
        .filter(col("n_tok") >= 30)
      val keep = q.groupBy(md5(col("text").cast("binary")))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val dq = q.join(keep, "doc_id")
      val sh = TextOps.shingles(docs, 3)
      val testSh = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select("sh").distinct()
      val contaminated = sh.join(broadcast(testSh), "sh")
        .select("doc_id").distinct()
      val clean = dq.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
      val samp = clean.filter(expr(HKey) < 2147483648L)
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      samp.withColumn("filled", sum("n_tok").over(w) - col("n_tok"))
        .selectExpr("doc_id", "source", "n_tok",
          "CAST(filled div 512 AS BIGINT) AS bin")
        .orderBy("doc_id")
    }
  )
}
