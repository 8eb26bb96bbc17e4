package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** SURVEY.md §2 I: scalar function surface — string, date, math,
  * array (higher-order), map/json. Integer-typed derivations are cast
  * to BIGINT on BOTH sides (engines disagree on default widths:
  * DuckDB year()/len() return BIGINT where Spark returns INT);
  * transcendentals (ln, power) are rounded — libm vs Math may differ
  * in the last ulp. */
object ScalarQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_str_funcs",
      """SELECT doc_id,
        |  upper(substring(text, 1, 12)) AS head,
        |  CAST(length(text) AS BIGINT) AS n_len,
        |  text LIKE '%query%' AS has_query,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  concat_ws('|', lang, source) AS tag
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).selectExpr("doc_id",
          "upper(substring(text, 1, 12)) AS head",
          "CAST(length(text) AS BIGINT) AS n_len",
          "text LIKE '%query%' AS has_query",
          "regexp_extract(text, '([a-z]+)', 1) AS first_word",
          "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
          "concat_ws('|', lang, source) AS tag")
        .orderBy("doc_id")
    },

    QueryDef("q_date_funcs",
      """SELECT o_orderkey,
        |  epoch_us(date_trunc('month', o_orderdate)) AS month_start,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(isodow(o_orderdate) AS BIGINT) AS dow,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  epoch_us(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) AS od
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // temporal outputs as epoch-µs BIGINT (SURVEY.md §7.4): raw
      // TIMESTAMP columns read tz-aware from Spark parquet but naive
      // from DuckDB; DATE columns read as python date vs datetime64
      // round 18: sort FIRST on the narrow key, derive the seven
      // temporal columns after — the final Exchange rangepartitioning
      // samples its child for boundaries, so expressions below the sort
      // run an extra time per run (guide §1/§2.4); below the sort only
      // (o_orderkey, o_orderdate) now flow, 16 bytes/row vs 7 outputs
      Tables.orders(s, d).select("o_orderkey", "o_orderdate")
        .orderBy("o_orderkey")
        .selectExpr("o_orderkey",
          "unix_micros(date_trunc('month', o_orderdate)) AS month_start",
          "CAST(year(o_orderdate) AS BIGINT) AS y",
          "CAST(month(o_orderdate) AS BIGINT) AS mo",
          "CAST(weekday(o_orderdate) + 1 AS BIGINT) AS dow",
          "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) AS days_since",
          "unix_micros(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) AS od")
    },

    QueryDef("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice / l_quantity AS unit_price,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  sqrt(l_quantity) AS sqrt_qty,
        |  round(power(l_quantity, 2.0), 6) AS qty_sq,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate,
        |  CAST(l_orderkey % 7 AS BIGINT) AS mod7,
        |  CAST(l_orderkey // 7 AS BIGINT) AS div7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      // round 18: sort FIRST on the narrow keys, project the nine math
      // columns after — the final Exchange rangepartitioning samples its
      // child, so everything below the sort runs an extra time per run
      // (the driver's 32-core bench read 5.6 s here vs 1.25 at 8; guide
      // §1/§2.4); below the sort only the six source numerics flow
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
          "l_quantity", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
        .selectExpr("l_orderkey", "l_linenumber",
          "l_extendedprice / l_quantity AS unit_price",
          "abs(l_discount - 0.05) AS disc_dev",
          "round(ln(l_extendedprice), 6) AS ln_price",
          "sqrt(l_quantity) AS sqrt_qty",
          "round(power(l_quantity, 2.0), 6) AS qty_sq",
          "greatest(l_tax, l_discount) AS max_rate",
          "least(l_tax, l_discount) AS min_rate",
          "CAST(l_orderkey % 7 AS BIGINT) AS mod7",
          "CAST(l_orderkey div 7 AS BIGINT) AS div7")
    },

    QueryDef("q_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS e1,
        |  embedding[2] AS e2,
        |  embedding[3] AS e3,
        |  list_max(embedding) AS e_max,
        |  list_contains(embedding, embedding[1]) AS has_first,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |    (a, x) -> a + x), 4) AS e_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      // higher-order functions: sequential left fold in index order —
      // the same evaluation order DuckDB's list_reduce uses, so the
      // double sum is bit-identical. Scalar outputs only: list-typed
      // columns crash the driver's pandas sort_values.
      Tables.embeddings(s, d).selectExpr("vec_id",
          "CAST(size(embedding) AS BIGINT) AS dim",
          "element_at(embedding, 1) AS e1",
          "element_at(embedding, 2) AS e2",
          "element_at(embedding, 3) AS e3",
          "array_max(embedding) AS e_max",
          "array_contains(embedding, element_at(embedding, 1)) AS has_first",
          """round(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),
            |  CAST(0.0 AS DOUBLE), (a, x) -> a + x), 4) AS e_sum""".stripMargin)
        .orderBy("vec_id")
    },

    QueryDef("q_str_funcs2",
      """SELECT doc_id,
        |  lpad(lang, 6, '_') AS lp,
        |  rpad(lang, 6, '_') AS rp,
        |  trim(substring(text, 1, 10)) AS tr,
        |  replace(substring(text, 1, 30), ' ', '_') AS repl,
        |  split_part(text, ' ', 2) AS second_tok,
        |  left(text, 8) AS l8,
        |  right(text, 8) AS r8,
        |  reverse(lang) AS rev,
        |  repeat(lang, 2) AS rep2,
        |  CAST(levenshtein(substring(text, 1, 20), 'the quick brown fox') AS BIGINT) AS lev
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).selectExpr("doc_id",
          "lpad(lang, 6, '_') AS lp",
          "rpad(lang, 6, '_') AS rp",
          "trim(substring(text, 1, 10)) AS tr",
          "replace(substring(text, 1, 30), ' ', '_') AS repl",
          "split_part(text, ' ', 2) AS second_tok",
          "left(text, 8) AS l8",
          "right(text, 8) AS r8",
          "reverse(lang) AS rev",
          "repeat(lang, 2) AS rep2",
          "CAST(levenshtein(substring(text, 1, 20), 'the quick brown fox') AS BIGINT) AS lev")
        .orderBy("doc_id")
    },

    QueryDef("q_map_json_funcs",
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k,
        |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
        |  array_to_string(list_sort(list_transform(json_keys(props),
        |    kk -> CAST(props->>('$.' || kk) AS BIGINT))), ',') AS vs
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      // string-joined sorted keys/values: list-typed output columns
      // crash the driver's pandas sort_values; sort removes any
      // engine-specific JSON key-order dependence
      // ONE from_json per row; k/ks/vs all derive from the parsed map
      // round 18: sort FIRST on the narrow key, parse AFTER — the final
      // Exchange rangepartitioning samples its child for boundaries, so
      // from_json used to run an extra time per run over every row (the
      // single most anti-scaling query in the driver's r17 bench: 15.0 s
      // at 32 cores vs 1.25 s at 8; guide §1/§2.4). Below the sort only
      // (event_id, props) flow; the parse runs once, above the sort.
      Tables.events(s, d)
        .select("event_id", "props")
        .orderBy("event_id")
        .withColumn("m", expr("from_json(props, 'map<string,bigint>')"))
        .selectExpr("event_id",
          "element_at(m, 'k') AS k",
          "array_join(array_sort(map_keys(m)), ',') AS ks",
          "array_join(array_sort(map_values(m)), ',') AS vs")
    }
  )
}
