package graft.fuzz

import scala.util.Random

/** Seeded differential-fuzz query generator (VERDICT r10 next #1).
  *
  * The fixed 216-query oracle sweep can only catch regressions in
  * DECLARED shapes; this generator covers the space nobody declared:
  * random predicates × groupings × aggregates × window frames × join
  * shapes × set ops × subqueries over the standard test tables, each
  * query rendered simultaneously in the Spark and DuckDB dialects
  * from one AST, constrained to SURVEY §7.4-safe arithmetic so any
  * hash mismatch is a real engine/optimizer divergence, never an
  * expected IEEE/rounding artifact. Because the Spark side executes
  * inside a GraftExtensions session (graft.Fuzz), the sweep also
  * fuzzes the repo's own optimizer rules against shapes their specs
  * never enumerated.
  *
  * §7.4 constraints encoded here:
  *  - integer arithmetic only inside aggregates (money via the proven
  *    `CAST(round(col*100) AS BIGINT)` cents form; both engines'
  *    round() are away-from-zero for doubles);
  *  - the ONLY generated doubles are min/max selections of a raw
  *    column and one IEEE division of two exact integers (avg) —
  *    never accumulated, never re-rounded;
  *  - integer division/modulo render per dialect (`div` vs `//`,
  *    verified truncating identically, negatives included);
  *  - timestamps only enter as exact integer derivations
  *    (unix_micros/epoch_us reduced to day/hour indexes before any
  *    aggregation can overflow);
  *  - ROWS window frames and row_number/lag/lead always order by a
  *    unique key; RANGE frames may order by any int expression
  *    (peer-inclusive semantics are tie-proof);
  *  - nullable join outputs are coalesced to sentinels so the pandas
  *    dtype compare never sees a one-sided int→float promotion;
  *  - magnitudes are capped (one multiplication per path, literal
  *    factors ≤ 20) so BIGINT sums can't overflow where the engines
  *    disagree on wrapping.
  */
object QueryGen {

  /** One generated query: the same logical query rendered for both
    * engines. */
  final case class FuzzQuery(name: String, sparkSql: String, duckSql: String)

  // ---- two-dialect text ------------------------------------------------
  final case class Tx(s: String, d: String) {
    def +(o: Tx): Tx = Tx(s + o.s, d + o.d)
  }
  private object Tx {
    def same(x: String): Tx = Tx(x, x)
  }
  import scala.language.implicitConversions
  private implicit def str2tx(x: String): Tx = Tx.same(x)
  private def cat(parts: Tx*): Tx = parts.foldLeft(Tx("", ""))(_ + _)
  private def mkTx(parts: Seq[Tx], sep: String): Tx =
    if (parts.isEmpty) Tx("", "")
    else parts.reduce((a, b) => a + sep + b)

  // ---- catalog ---------------------------------------------------------
  sealed trait Kind
  case object IntK extends Kind    // int32/int64 column
  case object MoneyK extends Kind  // double, cents-convertible
  case object QtyK extends Kind    // integral-valued double
  case object StrK extends Kind
  case object TsK extends Kind

  final case class Col(name: String, kind: Kind)
  final case class Table(
      name: String,
      cols: Seq[Col],
      uniqueKey: Seq[String],
      cats: Map[String, Seq[String]])

  val events: Table = Table("events",
    Seq(Col("event_id", IntK), Col("user_id", IntK),
      Col("event_type", StrK), Col("value", MoneyK), Col("ts", TsK)),
    Seq("event_id"),
    Map("event_type" -> Seq("click", "view", "purchase", "signup", "error")))

  val lineitem: Table = Table("lineitem",
    Seq(Col("l_orderkey", IntK), Col("l_partkey", IntK), Col("l_suppkey", IntK),
      Col("l_linenumber", IntK), Col("l_quantity", QtyK),
      Col("l_extendedprice", MoneyK), Col("l_discount", MoneyK),
      Col("l_returnflag", StrK), Col("l_linestatus", StrK),
      Col("l_shipdate", TsK)),
    // the synthetic fixture does NOT keep (l_orderkey, l_linenumber)
    // unique (up to 5 dups) — no usable total order, so lineitem is
    // excluded from the order-sensitive templates (ROWS frames,
    // row_number/lag/lead, top-k)
    Seq.empty,
    Map("l_returnflag" -> Seq("A", "N", "R"), "l_linestatus" -> Seq("F", "O")))

  val orders: Table = Table("orders",
    Seq(Col("o_orderkey", IntK), Col("o_custkey", IntK),
      Col("o_orderstatus", StrK), Col("o_totalprice", MoneyK),
      Col("o_orderdate", TsK), Col("o_orderpriority", StrK)),
    Seq("o_orderkey"),
    Map("o_orderstatus" -> Seq("F", "O", "P"),
      "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")))

  val customer: Table = Table("customer",
    Seq(Col("c_custkey", IntK), Col("c_nationkey", IntK),
      Col("c_acctbal", MoneyK), Col("c_mktsegment", StrK),
      Col("c_name", StrK)),
    Seq("c_custkey"),
    Map("c_mktsegment" -> Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")))

  val nation: Table = Table("nation",
    Seq(Col("n_nationkey", IntK), Col("n_name", StrK),
      Col("n_regionkey", IntK)),
    Seq("n_nationkey"), Map.empty)

  private val tables = Seq(events, lineitem, orders, customer, nation)

  /** (left, right, leftKey, rightKey) equi-join pairs with unique
    * right keys (PK side), so LEFT joins can't fan out. */
  private val joinPairs = Seq(
    (orders, customer, "o_custkey", "c_custkey"),
    (lineitem, orders, "l_orderkey", "o_orderkey"),
    (customer, nation, "c_nationkey", "n_nationkey"))

  // ---- expression generators ------------------------------------------
  /** A column reference usable in generated text: `q` is the (maybe
    * alias-qualified) SQL name. */
  private final case class Ref(q: String, col: Col)

  private def refs(t: Table, alias: String = ""): Seq[Ref] = {
    val p = if (alias.isEmpty) "" else s"$alias."
    t.cols.map(c => Ref(p + c.name, c))
  }

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  /** Exact-integer scalar expression. `allowMult` caps multiplication
    * at one per path (overflow discipline). */
  private def genInt(r: Random, cols: Seq[Ref], depth: Int,
                     allowMult: Boolean = true): Tx = {
    val intCols = cols.filter(c => c.col.kind == IntK)
    val moneyCols = cols.filter(_.col.kind == MoneyK)
    val qtyCols = cols.filter(_.col.kind == QtyK)
    val tsCols = cols.filter(_.col.kind == TsK)
    val strCols = cols.filter(_.col.kind == StrK)
    def base: Tx = r.nextInt(7) match {
      case 0 | 1 if intCols.nonEmpty => Tx.same(pick(r, intCols).q)
      case 2 if moneyCols.nonEmpty =>
        Tx.same(s"CAST(round(${pick(r, moneyCols).q}*100) AS BIGINT)")
      case 3 if qtyCols.nonEmpty =>
        Tx.same(s"CAST(${pick(r, qtyCols).q} AS BIGINT)")
      case 4 if tsCols.nonEmpty =>
        val c = pick(r, tsCols).q
        val us = Tx(s"unix_micros($c)", s"epoch_us($c)")
        if (r.nextBoolean())
          cat("(", us, Tx(" div 86400000000)", " // 86400000000)")) // epoch day
        else
          cat("((", us, Tx(" div 3600000000)", " // 3600000000)"), " % 24)") // hour
      case 5 if strCols.nonEmpty => Tx.same(s"length(${pick(r, strCols).q})")
      case _ => Tx.same((r.nextInt(2000) - 500).toString)
    }
    if (depth <= 0) base
    else r.nextInt(8) match {
      case 0 => cat("(", genInt(r, cols, depth - 1, allowMult), " + ",
        genInt(r, cols, depth - 1, allowMult), ")")
      case 1 => cat("(", genInt(r, cols, depth - 1, allowMult), " - ",
        genInt(r, cols, depth - 1, allowMult), ")")
      case 2 if allowMult =>
        cat("(", genInt(r, cols, depth - 1, allowMult = false), " * ",
          (r.nextInt(19) + 2).toString, ")")
      case 3 =>
        cat("(", genInt(r, cols, depth - 1, allowMult),
          Tx(" div ", " // "), (r.nextInt(97) + 2).toString, ")")
      case 4 =>
        cat("(", genInt(r, cols, depth - 1, allowMult), " % ",
          (r.nextInt(95) + 3).toString, ")")
      case 5 => cat("abs(", genInt(r, cols, depth - 1, allowMult), ")")
      case 6 =>
        cat("CASE WHEN ", genPred(r, cols, depth - 1), " THEN ",
          genInt(r, cols, depth - 1, allowMult), " ELSE ",
          genInt(r, cols, depth - 1, allowMult), " END")
      case _ =>
        cat(if (r.nextBoolean()) "greatest(" else "least(",
          genInt(r, cols, depth - 1, allowMult), ", ",
          genInt(r, cols, depth - 1, allowMult), ")")
    }
  }

  /** String scalar expression (no aggregation ever applied to the
    * concat results — only equality/LIKE/min/max selections). */
  private def genStr(r: Random, cols: Seq[Ref], depth: Int): Tx = {
    val strCols = cols.filter(_.col.kind == StrK)
    if (strCols.isEmpty) return Tx.same("'x'")
    def base: Tx = Tx.same(pick(r, strCols).q)
    if (depth <= 0) base
    else r.nextInt(5) match {
      case 0 => cat("upper(", genStr(r, cols, depth - 1), ")")
      case 1 => cat("lower(", genStr(r, cols, depth - 1), ")")
      case 2 => cat("substr(", genStr(r, cols, depth - 1), ", ",
        (r.nextInt(3) + 1).toString, ", ", (r.nextInt(6) + 1).toString, ")")
      case 3 => cat("(", genStr(r, cols, depth - 1), " || ",
        genStr(r, cols, depth - 1), ")")
      case _ => base
    }
  }

  /** Boolean predicate. Comparisons are biased toward modulo forms
    * (`expr % k cmp c`, c < k) whose per-row hit rate is ~uniform —
    * free-range `exprA cmp exprB` over key-scale magnitudes is almost
    * always one-sided and would leave most generated queries empty,
    * which discriminates nothing. */
  private def genPred(r: Random, cols: Seq[Ref], depth: Int): Tx = {
    val strCols = cols.filter(_.col.kind == StrK)
    def cmp: Tx =
      if (r.nextBoolean()) {
        val k = r.nextInt(17) + 3
        val op = pick(r, Seq("<", "<=", ">", ">=", "=", "<>"))
        cat("(abs(", genInt(r, cols, 1), s") % $k $op ${r.nextInt(k)})")
      } else {
        val op = pick(r, Seq("<", "<=", ">", ">=", "=", "<>"))
        cat("(", genInt(r, cols, 1), s" $op ", genInt(r, cols, 1), ")")
      }
    def strPred: Tx =
      if (strCols.isEmpty) cmp
      else {
        val c = pick(r, strCols)
        val catsOf = tables.flatMap(_.cats.get(c.col.name)).headOption
        r.nextInt(3) match {
          case 0 if catsOf.nonEmpty =>
            val vals = r.shuffle(catsOf.get).take(r.nextInt(catsOf.get.size) + 1)
            Tx.same(s"${c.q} IN (${vals.map(v => s"'$v'").mkString(", ")})")
          case 1 =>
            val pat = pick(r, Seq("%a%", "%e%", "A%", "%1%", "%o%", "_%o%"))
            Tx.same(s"${c.q} LIKE '$pat'")
          case _ =>
            // ORDER comparisons between string exprs (~50% hit under
            // binary collation, identical in both engines); equality
            // to a generated concat would almost never match
            cat("(", genStr(r, cols, 1),
              s" ${pick(r, Seq("<", "<=", ">", ">="))} ",
              genStr(r, cols, 1), ")")
        }
      }
    def between: Tx = {
      val lo = r.nextInt(5000)
      val width = r.nextInt(3) match {
        case 0 => r.nextInt(1000)
        case 1 => r.nextInt(100000)
        case _ => r.nextInt(10000000) // wide enough to catch key-scale exprs
      }
      cat("(", genInt(r, cols, 1), s" BETWEEN $lo AND ${lo + width})")
    }
    if (depth <= 0) { if (r.nextBoolean()) cmp else strPred }
    else r.nextInt(7) match {
      case 0 => cat("(", genPred(r, cols, depth - 1), " AND ",
        genPred(r, cols, depth - 1), ")")
      case 1 | 2 => cat("(", genPred(r, cols, depth - 1), " OR ",
        genPred(r, cols, depth - 1), ")")
      case 3 => cat("(NOT ", genPred(r, cols, depth - 1), ")")
      case 4 => between
      case 5 => strPred
      case _ => cmp
    }
  }

  /** Group-key expression: low-cardinality on purpose. Date-function
    * keys (round 12, VERDICT r11 next #3): year/month/day over a
    * timestamp column — calendar grouping is what real rollups key on,
    * and both engines' extractors reduce the same µs instant to the
    * same exact integer (session TZ pinned UTC on both sides). */
  private def genKey(r: Random, cols: Seq[Ref]): (Tx, Kind) = {
    val strCols = cols.filter(_.col.kind == StrK)
    val intCols = cols.filter(_.col.kind == IntK)
    val tsCols = cols.filter(_.col.kind == TsK)
    r.nextInt(4) match {
      case 0 if strCols.nonEmpty => (Tx.same(pick(r, strCols).q), StrK)
      case 1 if intCols.nonEmpty =>
        (cat("(", pick(r, intCols).q, " % ", (r.nextInt(9) + 2).toString, ")"), IntK)
      case 2 if tsCols.nonEmpty =>
        val f = pick(r, Seq("year", "month", "day"))
        (Tx.same(s"$f(${pick(r, tsCols).q})"), IntK)
      case _ if intCols.nonEmpty =>
        (cat("(", pick(r, intCols).q, Tx(" div ", " // "),
          (r.nextInt(900) + 100).toString, ")"), IntK)
      case _ =>
        val c = pick(r, cols)
        (Tx.same(c.q), c.col.kind)
    }
  }

  /** Aggregate expression over already-generated scalar texts, with
    * its output kind. DuckDB integer sums go HUGEINT → cast back to
    * BIGINT there. The DOUBLE aggregates (raw-column min/max, the
    * exact-int avg division) must NOT be re-cast to BIGINT at the top
    * level: Spark's double→bigint cast truncates while DuckDB's
    * ROUNDS — kind = MoneyK keeps them uncast. */
  private def genAgg(r: Random, cols: Seq[Ref]): (Tx, Kind) = {
    val moneyCols = cols.filter(_.col.kind == MoneyK)
    r.nextInt(9) match {
      case 0 => (Tx.same("count(*)"), IntK)
      case 1 => (Tx.same(s"count(DISTINCT ${pick(r, cols.filter(c =>
        c.col.kind == IntK || c.col.kind == StrK)).q})"), IntK)
      case 2 | 3 =>
        val e = genInt(r, cols, 2)
        val distinct = if (r.nextInt(4) == 0) "DISTINCT " else ""
        (cat(Tx(s"sum($distinct", s"CAST(sum($distinct"), e,
          Tx(")", ") AS BIGINT)")), IntK)
      case 4 =>
        (cat(if (r.nextBoolean()) "min(" else "max(", genInt(r, cols, 2), ")"),
          IntK)
      case 5 if moneyCols.nonEmpty =>
        // exact double selection of a raw column — no accumulation
        (cat(if (r.nextBoolean()) "min(" else "max(",
          Tx.same(pick(r, moneyCols).q), ")"), MoneyK)
      case 6 =>
        // one IEEE division of two exact integers (unrounded, §7.4)
        val e = genInt(r, cols, 1)
        (cat("(CAST(", Tx("sum(", "CAST(sum("), e, Tx(")", ") AS BIGINT)"),
          " AS DOUBLE) / CAST(count(*) AS DOUBLE))"), MoneyK)
      case 7 =>
        // bool→BIGINT casts agree exactly (0/1), unlike double→bigint
        (cat(if (r.nextBoolean()) "bool_and(" else "bool_or(",
          genPred(r, cols, 1), ")"), IntK)
      case _ =>
        // conditional aggregation (round 12): sum(CASE WHEN p THEN a
        // ELSE b END) — the pivot/sparse-metric shape; identical text
        // in both dialects, exact-integer branches
        (cat(Tx("sum(", "CAST(sum("), "CASE WHEN ", genPred(r, cols, 1),
          " THEN ", genInt(r, cols, 1), " ELSE ", genInt(r, cols, 1),
          Tx(" END)", " END) AS BIGINT)")), IntK)
    }
  }

  /** Wrap a top-level select item so both engines emit the same
    * pandas dtype (int32 columns, DuckDB HUGEINT sums etc.). */
  private def item(e: Tx, kind: Kind, as: String): Tx = kind match {
    case IntK => cat("CAST(", e, s" AS BIGINT) AS $as")
    case _ => cat(e, s" AS $as")
  }

  // ---- query templates -------------------------------------------------
  private def qProject(r: Random): Tx = {
    val t = pick(r, tables)
    val cs = refs(t)
    val items = (0 until r.nextInt(3) + 2).map { i =>
      if (r.nextInt(4) == 0) item(genStr(r, cs, 2), StrK, s"c$i")
      else item(genInt(r, cs, 2), IntK, s"c$i")
    }
    cat("SELECT ", if (r.nextInt(4) == 0) "DISTINCT " else "",
      mkTx(items, ", "), s" FROM ${t.name} WHERE ", genPred(r, cs, 2))
  }

  /** HAVING predicates use exact-INTEGER aggregates only: a boolean
    * aggregate can't compare to an int, and casting a double agg to
    * BIGINT would filter groups through the trunc-vs-round divergence
    * the output discipline exists to avoid. */
  private def having(r: Random, cols: Seq[Ref]): Tx = {
    val agg = r.nextInt(4) match {
      case 0 => Tx.same("count(*)")
      case 1 | 2 => cat(Tx("sum(", "CAST(sum("), genInt(r, cols, 1),
        Tx(")", ") AS BIGINT)"))
      case _ => cat(if (r.nextBoolean()) "min(" else "max(",
        genInt(r, cols, 1), ")")
    }
    cat(" HAVING ", agg, s" ${pick(r, Seq("<", ">", ">=", "<="))} ",
      (r.nextInt(20000) - 5000).toString)
  }

  private def qAgg(r: Random): Tx = {
    val t = pick(r, tables)
    val cs = refs(t)
    val nKeys = r.nextInt(2) + 1
    val keys = (0 until nKeys).map(_ => genKey(r, cs))
    val aggs = (0 until r.nextInt(3) + 1).map(_ => genAgg(r, cs))
    val keyItems = keys.zipWithIndex.map { case ((k, kind), i) => item(k, kind, s"k$i") }
    val aggItems = aggs.zipWithIndex.map { case ((a, kind), i) => item(a, kind, s"a$i") }
    cat("SELECT ", mkTx(keyItems ++ aggItems, ", "),
      s" FROM ${t.name} WHERE ", genPred(r, cs, 2),
      " GROUP BY ", mkTx(keys.map(_._1), ", "),
      if (r.nextInt(3) == 0) having(r, cs) else Tx("", ""))
  }

  private def qJoinAgg(r: Random): Tx = {
    val (lt, rt, lk, rk) = pick(r, joinPairs)
    val l = refs(lt, "a")
    val rr = refs(rt, "b")
    r.nextInt(4) match {
      case 0 => // inner join + agg over both sides
        val both = l ++ rr
        val (k, kind) = genKey(r, both)
        val aggs = (0 until r.nextInt(2) + 1).map(_ => genAgg(r, both))
        cat("SELECT ", mkTx(item(k, kind, "k0") +:
            aggs.zipWithIndex.map { case ((a, ak), i) => item(a, ak, s"a$i") }, ", "),
          s" FROM ${lt.name} a JOIN ${rt.name} b ON a.$lk = b.$rk WHERE ",
          genPred(r, both, 1), " GROUP BY ", k)
      case 1 => // left join: right side coalesced before use
        val rInt = rr.filter(_.col.kind == IntK)
        val rex = cat("coalesce(", pick(r, rInt).q, ", -1)")
        val (k, kind) = genKey(r, l)
        cat("SELECT ", item(k, kind, "k0"), ", count(*) AS a0, ",
          item(cat(Tx("sum(", "CAST(sum("), rex, Tx(")", ") AS BIGINT)")),
            IntK, "a1"),
          s" FROM ${lt.name} a LEFT JOIN ${rt.name} b ON a.$lk = b.$rk WHERE ",
          genPred(r, l, 1), " GROUP BY ", k)
      case 2 => // semi/anti via EXISTS
        val ex = if (r.nextBoolean()) "EXISTS" else "NOT EXISTS"
        val (k, kind) = genKey(r, l)
        cat("SELECT ", item(k, kind, "k0"), ", count(*) AS a0, ",
          { val (a, ak) = genAgg(r, l); item(a, ak, "a1") },
          s" FROM ${lt.name} a WHERE ", genPred(r, l, 1),
          s" AND $ex (SELECT 1 FROM ${rt.name} b WHERE b.$rk = a.$lk AND ",
          genPred(r, rr, 1), ") GROUP BY ", k)
      case _ => // IN subquery
        val neg = if (r.nextBoolean()) "" else "NOT "
        val (k, kind) = genKey(r, l)
        cat("SELECT ", item(k, kind, "k0"), ", count(*) AS a0",
          s" FROM ${lt.name} a WHERE ", genPred(r, l, 1),
          s" AND a.$lk ${neg}IN (SELECT b.$rk FROM ${rt.name} b WHERE ",
          genPred(r, rr, 1), ") GROUP BY ", k)
    }
  }

  private def qWindow(r: Random): Tx = {
    val t = pick(r, tables.filter(_.uniqueKey.nonEmpty))
    val cs = refs(t)
    val (p, _) = genKey(r, cs)
    val uk = t.uniqueKey.mkString(", ")
    val x = genInt(r, cs, 1)
    val rowFrame = pick(r, Seq(
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
      s"ROWS BETWEEN ${r.nextInt(5) + 1} PRECEDING AND CURRENT ROW",
      s"ROWS BETWEEN ${r.nextInt(3) + 1} PRECEDING AND ${r.nextInt(3) + 1} FOLLOWING"))
    val wf: Tx = r.nextInt(10) match {
      case 0 => cat(s"row_number() OVER (PARTITION BY ", p, s" ORDER BY $uk)")
      case 1 => cat(s"rank() OVER (PARTITION BY ", p, s" ORDER BY $uk)")
      case 2 => cat("lag(", x, s", 1, 0) OVER (PARTITION BY ", p,
        s" ORDER BY $uk)")
      case 3 => cat("lead(", x, s", 1, 0) OVER (PARTITION BY ", p,
        s" ORDER BY $uk)")
      case 4 =>
        // no inner duck cast: `CAST(sum(x) AS BIGINT) OVER (...)` is a
        // parse error — item()'s outer CAST normalizes the HUGEINT
        cat("sum(", x, ") OVER (PARTITION BY ", p,
          s" ORDER BY $uk $rowFrame)")
      case 5 =>
        cat(if (r.nextBoolean()) "min(" else "max(", x,
          ") OVER (PARTITION BY ", p, s" ORDER BY $uk $rowFrame)")
      case 6 =>
        cat("count(*) OVER (PARTITION BY ", p, s" ORDER BY $uk $rowFrame)")
      case 7 =>
        // ntile assigns by ROW position — ties would be nondeterministic,
        // so the unique key order is load-bearing here
        cat(s"ntile(${r.nextInt(7) + 2}) OVER (PARTITION BY ", p,
          s" ORDER BY $uk)")
      case 8 =>
        // dense_rank over a possibly-tied order IS deterministic
        // (peer-based), unlike rank-by-position forms
        cat("dense_rank() OVER (PARTITION BY ", p, " ORDER BY ",
          genInt(r, cs, 0), s", $uk)")
      case _ =>
        // RANGE frame: peer-inclusive, so a non-unique int order key is
        // still deterministic
        cat("sum(", x, ") OVER (PARTITION BY ", p, " ORDER BY ",
          genInt(r, cs, 0),
          s" RANGE BETWEEN ${(r.nextInt(50) + 1) * 10} PRECEDING AND CURRENT ROW)")
    }
    val ukItems = t.uniqueKey.map(k => s"CAST($k AS BIGINT) AS u_$k")
    cat("SELECT ", Tx.same(ukItems.mkString(", ")), ", ",
      item(wf, IntK, "w0"),
      s" FROM ${t.name} WHERE ", genPred(r, cs, 1))
  }

  /** Text-pipeline shapes over the documents corpus — the one family
    * whose Spark/DuckDB renderings differ STRUCTURALLY, not just
    * lexically: tokenization is LATERAL VIEW explode(split(...)) vs
    * unnest(string_split(...)), and digest dedup leans on md5() hex
    * output being byte-identical across engines. `text` itself never
    * appears in an output column (only its tokens/digest/length). */
  private def qText(r: Random): Tx = {
    val docPred: Tx = r.nextInt(3) match {
      case 0 => Tx.same(s"n_chars ${pick(r, Seq("<", ">="))} ${r.nextInt(4000) + 200}")
      case 1 => Tx.same(s"doc_id % ${r.nextInt(7) + 2} = ${r.nextInt(2)}")
      case _ => Tx.same(s"lang ${if (r.nextBoolean()) "=" else "<>"} 'en'")
    }
    r.nextInt(3) match {
      case 0 =>
        // per-language token counts: the wordcount shape
        val minLen = r.nextInt(4) + 1
        cat(
          Tx("SELECT lang AS k0, w AS k1, count(*) AS a0 FROM " +
               "(SELECT lang, w FROM documents " +
               "LATERAL VIEW explode(split(text, ' ')) tok AS w WHERE ",
             "SELECT lang AS k0, w AS k1, count(*) AS a0 FROM " +
               "(SELECT lang, unnest(string_split(text, ' ')) AS w " +
               "FROM documents WHERE "),
          docPred,
          Tx(") t WHERE length(w) >= ", ") t WHERE length(w) >= "),
          minLen.toString,
          " GROUP BY lang, w HAVING count(*) > ", (r.nextInt(20) + 2).toString)
      case 1 =>
        // exact-dedup shape: digest groups with a duplicate floor
        cat("SELECT md5(text) AS k0, count(*) AS a0, ",
          "CAST(min(doc_id) AS BIGINT) AS a1 FROM documents WHERE ",
          docPred, s" GROUP BY md5(text) HAVING count(*) > ${r.nextInt(2)}")
      case _ =>
        // token-length profile per source: tokenize + int aggregate
        cat(
          Tx("SELECT source AS k0, count(*) AS a0, " +
               "CAST(sum(length(w)) AS BIGINT) AS a1, " +
               "CAST(max(length(w)) AS BIGINT) AS a2 FROM " +
               "(SELECT source, w FROM documents " +
               "LATERAL VIEW explode(split(text, ' ')) tok AS w WHERE ",
             "SELECT source AS k0, count(*) AS a0, " +
               "CAST(sum(length(w)) AS BIGINT) AS a1, " +
               "CAST(max(length(w)) AS BIGINT) AS a2 FROM " +
               "(SELECT source, unnest(string_split(text, ' ')) AS w " +
               "FROM documents WHERE "),
          docPred, ") t GROUP BY source")
    }
  }

  /** Grouping-lattice aggregation (ROLLUP/CUBE). Grouping keys are
    * COALESCED to sentinels in the projection: the lattice's total
    * rows carry NULL keys, and a one-sided null would flip the pandas
    * int64 dtype to float64 — the sentinel keeps both engines int64
    * (source columns are non-null, so no real value collides). */
  private def qRollup(r: Random): Tx = {
    val t = pick(r, tables)
    val cs = refs(t)
    val k1 = genKey(r, cs)
    // redraw until the second key's TEXT differs — ROLLUP(k, k) is a
    // degenerate lattice and would gate on both engines agreeing about
    // duplicate grouping-expression expansion, which nothing else pins
    val k2 = Iterator.continually(genKey(r, cs))
      .take(8).find(_._1.s != k1._1.s).getOrElse(genKey(r, cs))
    val keys = Seq(k1, k2)
    val form = if (r.nextBoolean()) "ROLLUP" else "CUBE"
    val keyItems = keys.zipWithIndex.map { case ((k, kind), i) =>
      kind match {
        case StrK => cat("coalesce(", k, s", '~total~') AS k$i")
        case _ => cat("CAST(coalesce(", k, s", -99999) AS BIGINT) AS k$i")
      }
    }
    val (agg, aggKind) = genAgg(r, cs)
    // HAVING count(*) > 0 is load-bearing, not decoration: on EMPTY
    // input DuckDB (like Postgres) emits the grand-total grouping-set
    // row (count 0, NULL aggregates) while Spark emits NOTHING — a
    // genuine engine divergence this fuzzer found on its first
    // extended run. Every data-bearing lattice row has count >= 1, so
    // the guard only drops the empty-input total both engines disagree
    // on.
    cat("SELECT ", mkTx(keyItems, ", "), ", count(*) AS a0, ",
      item(agg, aggKind, "a1"),
      s" FROM ${t.name} WHERE ", genPred(r, cs, 1),
      s" GROUP BY $form (", keys(0)._1, ", ", keys(1)._1, ")",
      " HAVING count(*) > 0")
  }

  private def qSetOp(r: Random): Tx = {
    val t = pick(r, tables)
    val cs = refs(t)
    val op = pick(r, Seq("UNION ALL", "INTERSECT", "EXCEPT"))
    val nItems = r.nextInt(2) + 1
    def side(pred: Tx): Tx = {
      val items = (0 until nItems).map { i =>
        item(Tx.same(pick(r, cs.filter(c => c.col.kind == IntK)).q), IntK, s"c$i")
      } :+ item(genStr(r, cs, 1), StrK, s"c$nItems")
      cat("SELECT ", mkTx(items, ", "), s" FROM ${t.name} WHERE ", pred)
    }
    // IMPORTANT: both sides generated with separate draws, same shape
    val r2 = new Random(r.nextLong())
    val (s1, s2) = (genPred(r, cs, 2), genPred(r2, cs, 2))
    // regenerate side items deterministically per side
    cat(side(s1), s" $op ", side(s2))
  }

  private def qScalarSubq(r: Random): Tx = {
    val t = pick(r, tables)
    val t2 = pick(r, tables)
    val cs = refs(t)
    val cs2 = refs(t2)
    val sub = cat("(SELECT CAST(", pick(r, Seq("min", "max")), "(",
      genInt(r, cs2, 1), ") AS BIGINT) FROM ", t2.name, " WHERE ",
      genPred(r, cs2, 1), ")")
    val (k, kind) = genKey(r, cs)
    cat("SELECT ", item(k, kind, "k0"), ", count(*) AS a0, ",
      { val (a, ak) = genAgg(r, cs); item(a, ak, "a1") },
      s" FROM ${t.name} WHERE ", genPred(r, cs, 1),
      " AND ", genInt(r, cs, 1), s" ${pick(r, Seq("<", ">", "<=", ">="))} ",
      sub, " GROUP BY ", k)
  }
  private def qTopK(r: Random): Tx = {
    val t = pick(r, tables.filter(_.uniqueKey.nonEmpty))
    val cs = refs(t)
    val uk = t.uniqueKey.map(k => s"$k").mkString(", ")
    val ukItems = t.uniqueKey.map(k => s"CAST($k AS BIGINT) AS u_$k").mkString(", ")
    val e = genInt(r, cs, 2)
    cat("SELECT ", Tx.same(ukItems), ", ", item(e, IntK, "c0"),
      s" FROM ${t.name} WHERE ", genPred(r, cs, 1),
      " ORDER BY ", e, s" ${if (r.nextBoolean()) "DESC" else "ASC"}, $uk",
      s" LIMIT ${r.nextInt(200) + 1}")
  }

  /** FULL OUTER join (round 12, VERDICT r11 next #3): null-completion
    * on BOTH sides is a classic divergence nest — neither the declared
    * inventory's fixed q_join_full_outer parameters nor the LEFT-join
    * template reach it with random shapes. Each side is pre-FILTERED
    * so both null-completions actually occur (an unfiltered PK side
    * would match every FK row); every output that can be
    * null-extended is coalesced to a sentinel (the pandas dtype
    * discipline), and the group key is the coalesced join key reduced
    * mod a small constant. */
  private def qFullOuter(r: Random): Tx = {
    val (lt, rt, lk, rk) = pick(r, joinPairs)
    val l = refs(lt, "a")
    val rr = refs(rt, "b")
    val m = r.nextInt(9) + 2
    val lAgg = cat("sum(coalesce(", genInt(r, l, 1), ", -3))")
    val rAgg = cat("sum(coalesce(", genInt(r, rr, 1), ", -5))")
    cat(s"SELECT CAST(coalesce(a.$lk, b.$rk) % $m AS BIGINT) AS k0, ",
      "count(*) AS a0, ",
      cat(Tx("", "CAST("), lAgg, Tx("", " AS BIGINT)"), " AS a1, "),
      cat(Tx("", "CAST("), rAgg, Tx("", " AS BIGINT)"), " AS a2"),
      s" FROM (SELECT * FROM ${lt.name} WHERE ", genPred(r, refs(lt), 1),
      s") a FULL OUTER JOIN (SELECT * FROM ${rt.name} WHERE ",
      genPred(r, refs(rt), 1),
      s") b ON a.$lk = b.$rk GROUP BY coalesce(a.$lk, b.$rk) % $m")
  }

  /** Three-table join tree (round 12, VERDICT r11 next #3): the
    * chain shapes the optimizer actually reorders —
    * lineitem⋈orders⋈customer or orders⋈customer⋈nation — with a
    * random key drawn over ALL THREE scopes and an optional LEFT
    * final hop whose outputs coalesce to sentinels. */
  private def q3Join(r: Random): Tx = {
    val (t1, t2, t3, k12l, k12r, k23l, k23r) =
      if (r.nextBoolean())
        (lineitem, orders, customer,
          "l_orderkey", "o_orderkey", "o_custkey", "c_custkey")
      else
        (orders, customer, nation,
          "o_custkey", "c_custkey", "c_nationkey", "n_nationkey")
    val a = refs(t1, "a"); val b = refs(t2, "b"); val c = refs(t3, "c")
    val leftLast = r.nextBoolean()
    val joinKind = if (leftLast) "LEFT JOIN" else "JOIN"
    // with a LEFT last hop, c.* is nullable: keys/aggs over c coalesce
    val innerScope = a ++ b
    val (k, kind) =
      if (leftLast || r.nextBoolean()) genKey(r, innerScope)
      else genKey(r, a ++ b ++ c)
    val aggs = (0 until r.nextInt(2) + 1).map(_ => genAgg(r, innerScope))
    val cInt = c.filter(_.col.kind == IntK)
    val cAgg = cat("sum(coalesce(", pick(r, cInt).q, ", -7))")
    cat("SELECT ", item(k, kind, "k0"), ", count(*) AS a0, ",
      cat(Tx("", "CAST("), cAgg, Tx("", " AS BIGINT)"), " AS ac"),
      mkTx(Tx("", "") +: aggs.zipWithIndex.map { case ((g, gk), i) =>
        item(g, gk, s"a${i + 1}") }, ", "),
      s" FROM ${t1.name} a JOIN ${t2.name} b ON a.$k12l = b.$k12r",
      s" $joinKind ${t3.name} c ON b.$k23l = c.$k23r",
      " WHERE ", genPred(r, innerScope, 1),
      " GROUP BY ", k)
  }

  /** Two-level nested aggregation (round 12): an inner GROUP BY over a
    * mid-cardinality derived key feeding an outer re-aggregation — the
    * rollup-of-rollup shape (daily→monthly, per-key→per-bucket) no
    * single-level template reaches. The inner sum goes HUGEINT in
    * DuckDB, so it is cast back to BIGINT INSIDE the subquery — the
    * outer aggregates then see identical exact-integer inputs. */
  private def qNestedAgg(r: Random): Tx = {
    val t = pick(r, tables)
    val cs = refs(t)
    val intCols = cs.filter(_.col.kind == IntK)
    val g = cat("(", pick(r, intCols).q, Tx(" div ", " // "),
      (r.nextInt(40) + 3).toString, ")")
    val m = r.nextInt(9) + 2
    val inner = cat("SELECT ", g, " AS g, count(*) AS cnt, ",
      cat(Tx("sum(", "CAST(sum("), genInt(r, cs, 1),
        Tx(")", ") AS BIGINT)")), " AS s",
      s" FROM ${t.name} WHERE ", genPred(r, cs, 1), " GROUP BY ", g)
    cat(s"SELECT CAST(g % $m AS BIGINT) AS k0, ",
      "CAST(count(*) AS BIGINT) AS a0, ",
      "CAST(sum(cnt) AS BIGINT) AS a1, ",
      "CAST(min(s) AS BIGINT) AS a2, CAST(max(s) AS BIGINT) AS a3",
      " FROM (", inner, s") i GROUP BY g % $m")
  }

  /** Generate `n` queries from `seed`. Deterministic: the i-th query
    * depends only on (seed, i). */
  def generate(seed: Long, n: Int): Seq[FuzzQuery] =
    (0 until n).map { i =>
      val r = new Random(seed * 1000003L + i)
      val q = r.nextInt(15) match {
        case 0 | 1 => qProject(r)
        case 2 | 3 => qAgg(r)
        case 4 | 5 => qJoinAgg(r)
        case 6 | 7 => qWindow(r)
        case 8 => if (r.nextBoolean()) qSetOp(r) else qScalarSubq(r)
        case 9 => qRollup(r)
        case 10 => qText(r)
        case 11 => qTopK(r)
        case 12 => qFullOuter(r)
        case 13 => q3Join(r)
        case _ => qNestedAgg(r)
      }
      FuzzQuery(f"fz_${seed}_$i%04d", q.s, q.d)
    }
}
