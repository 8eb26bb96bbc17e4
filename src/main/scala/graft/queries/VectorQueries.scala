package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.VectorOps

/** SURVEY.md §2 J (vector half): brute-force cosine top-k (the ANN
  * correctness baseline), multimodal join, embedding-cosine near-dup.
  * Shared DuckDB formulation: cast-to-double, index-order products,
  * sequential list_reduce fold — bit-identical to VectorOps. */
object VectorQueries {

  /** DuckDB CTE computing normalized double vectors, mirroring
    * [[VectorOps.normalized]] (dim = 64, FIXTURES.md). */
  private val NormSql =
    """n AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x * x)),
      |           (a, x) -> a + x)) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  private val PairSimSql =
    """round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(range(1, 65), i -> a.v[i] * b.v[i])),
      |  (x, y) -> x + y) / a.nrm / b.nrm, 4)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_sim_cosine_topk",
      s"""WITH $NormSql,
         |p AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $PairSimSql AS sim
         |  FROM n a JOIN n b ON a.vec_id <> b.vec_id
         |),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY a_id
         |                     ORDER BY sim DESC, b_id) AS rn FROM p)
         |SELECT a_id, CAST(rn AS BIGINT) AS rn, b_id, sim
         |FROM rk WHERE rn <= 5 ORDER BY a_id, rn""".stripMargin) { (s, d) =>
      // rank on the ROUNDED sim with id tiebreak: ulp-level noise can
      // never reorder neighbors (SURVEY.md §7.4); tight-loop kernel
      // replaces the nested-loop join + window (same bits, ~5× faster)
      VectorOps.cosineTopK(Tables.embeddings(s, d), 5)
        .select(col("a_id"), col("rn"), col("b_id"), col("sim"))
        .orderBy("a_id", "rn")
    },

    QueryDef("q_multimodal_embed_topk",
      """WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 21 = 2),
        |v AS (SELECT media_id, list_transform(range(1, 17),
        |        j -> CAST(((media_id * 1009 + j * 7919) * 69069) % 4294967296 AS DOUBLE)
        |             / 4294967296.0 - 0.5) AS v
        |      FROM m),
        |n AS (SELECT media_id, v,
        |        sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |            list_transform(v, x -> x * x)), (a, x) -> a + x)) AS nrm
        |      FROM v),
        |p AS (SELECT a.media_id AS a_id, b.media_id AS b_id,
        |        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |            list_transform(range(1, 17), i -> a.v[i] * b.v[i])),
        |          (x, y) -> x + y) / a.nrm / b.nrm, 4) AS sim
        |      FROM n a JOIN n b ON a.media_id <> b.media_id),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY a_id
        |                    ORDER BY sim DESC, b_id) AS rn FROM p)
        |SELECT a_id, CAST(rn AS BIGINT) AS rn, b_id, sim
        |FROM rk WHERE rn <= 3 ORDER BY a_id, rn""".stripMargin) { (s, d) =>
      // the multimodal → embedding → ANN pipeline end to end: a STUB
      // feature extractor (deterministic integer-arithmetic fake — the
      // image/audio encoders aren't in this container, per the north
      // star the PLUMBING is the deliverable) produces a 16-dim vector
      // per media asset, which feeds the same block-grid cosine top-k
      // kernel the real embeddings use. Exact BIGINT feature arithmetic
      // (no overflow: ids*1009*69069 ≪ 2^63) makes the stub
      // oracle-expressible, so the whole path is hash-checked
      val emb = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(21)) === 2)
        .select(col("doc_id").as("vec_id"))
        .withColumn("embedding", expr(
          """transform(sequence(1, 16),
            |  j -> CAST(((vec_id * 1009 + CAST(j AS BIGINT) * 7919) * 69069)
            |            % 4294967296 AS DOUBLE) / 4294967296.0 - 0.5)""".stripMargin))
      VectorOps.cosineTopK(emb, 3)
        .select(col("a_id"), col("rn"), col("b_id"), col("sim"))
        .orderBy("a_id", "rn")
    },

    QueryDef("q_vec_norm_stats",
      """WITH n2 AS (
        |  SELECT label, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |        x -> x * x)), (a, x) -> a + x)) AS nrm
        |  FROM embeddings)
        |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm
        |FROM n2 GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      // per-label embedding norm profile — the sanity scan before any
      // cosine work (zero/degenerate norms are what normalized() drops).
      // Norms use the same sequential-fold dot as every kernel; min/max
      // are order-independent, so no rounding hazards beyond the final
      // display round. Narrow per-row work + one small agg.
      Tables.embeddings(s, d)
        .select(col("label").cast("bigint").as("label"),
          VectorOps.norm(VectorOps.asDouble(col("embedding"))).as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(min("nrm"), 4).as("min_norm"),
          round(max("nrm"), 4).as("max_norm"))
        .orderBy("label")
    },

    QueryDef("q_multimodal_join",
      """SELECT d.doc_id, d.lang, d.n_chars,
        |  round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), x -> x * x)),
        |    (a, x) -> a + x)), 4) AS vec_norm
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.lang = 'en' AND contains(d.text, 'data')
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(col("lang") === "en" && col("text").contains("data"))
        .join(Tables.embeddings(s, d), col("vec_id") === col("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(VectorOps.norm(VectorOps.asDouble(col("embedding"))), 4).as("vec_norm"))
        .orderBy("doc_id")
    },

    QueryDef("q_vec_quantize",
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS ma FROM v),
        |q AS (SELECT vec_id, ma,
        |        list_transform(v, x -> CASE WHEN ma = 0 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
        |      FROM m)
        |SELECT vec_id, ma AS scale,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), q), (a, x) -> a + x) AS qsum,
        |  list_min(q) AS qmin, list_max(q) AS qmax
        |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
      // int8 max-abs quantization — the storage/ANN compression step a
      // vector pipeline runs before indexing (4 bytes/dim → 1). Pure
      // array HOFs per row, no shuffle; floor(x·127/ma + 0.5) (not
      // round()) so both engines hit the identical IEEE double and
      // floor it exactly; summary columns keep the output scalar
      // round 18: sort FIRST on vec_id, quantize after — the array HOF
      // chain below the sort used to run an extra time per run for the
      // range exchange's boundary sampling (guide §1/§2.4); the sort
      // carries the raw embedding, the same array the HOFs would have
      // materialized per sampling pass
      val q = transform(col("v"), x =>
        when(col("ma") === 0.0, lit(0L))
          .otherwise(floor(x * lit(127.0) / col("ma") + lit(0.5)).cast("long")))
      Tables.embeddings(s, d)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
        .withColumn("q", q)
        .select(col("vec_id"), col("ma").as("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
          array_min(col("q")).as("qmin"), array_max(col("q")).as("qmax"))
    },

    QueryDef("q_dedup_embed",
      s"""WITH $NormSql,
         |p AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $PairSimSql AS sim
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id
         |)
         |SELECT a_id, b_id, sim FROM p WHERE sim >= 0.30
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      VectorOps.cosineThresholdPairs(Tables.embeddings(s, d), 0.30)
        .orderBy("a_id", "b_id")
    },

    QueryDef("q_vec_centroid",
      """SELECT CAST(label AS BIGINT) AS label, CAST(dim AS INT) AS dim,
        |  CAST(sum(CAST(round(CAST(embedding[dim] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS s_micro,
        |  CAST(count(*) AS BIGINT) AS n_vecs
        |FROM embeddings CROSS JOIN range(1, 65) r(dim)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // per-label centroid (the k-means/IVF training primitive as a
      // declared query): posexplode to (label, dim, x) then ONE
      // partial+final hash agg — rows×dim flows through the exchange as
      // 3 narrow columns, never whole vectors. Components are summed in
      // exact integer micro-units: both engines round the SAME IEEE
      // double x·1e6 half-away-from-zero, and integer sums are
      // order-independent, so the distributed sum order can't flip a
      // bit (the float-sum hazard the repo's oracle protocol documents).
      // The centroid itself is s_micro / n_vecs / 1e6, left unformed to
      // keep the output exact.
      Tables.embeddings(s, d)
        .select(col("label").cast("bigint").as("label"),
          posexplode(col("embedding")).as(Seq("p", "x")))
        .groupBy(col("label"), (col("p") + 1).cast("int").as("dim"))
        .agg(sum(expr("CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)")).as("s_micro"),
          count(lit(1)).as("n_vecs"))
        .orderBy("label", "dim")
    }
  )
}
