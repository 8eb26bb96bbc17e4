package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.sources.TsdbStore

/** Materialized-rollup substitution — the aggregate-navigation rewrite
  * of classical OLAP servers (and the reason the reference maintains
  * its aggregate cascade at all [pub: tsdb/aggregator.py precomputed
  * multi-res aggregates — unverified, SURVEY.md §0]), done the Catalyst
  * way: an optimizer `Rule[LogicalPlan]` that recognizes an ad-hoc
  * slot aggregation over a [[TsdbStore]] BASE table
  *
  *   base.groupBy(user_id, event_type, (ts_us div S·10⁶)·S as slot)
  *       .agg(count(1) / sum(cents) / min(cents) / max(cents) /
  *            avg(cents) / count(DISTINCT grain) / approx_count_distinct)
  *
  * and substitutes the store's materialized `agg_T` table for the raw
  * scan, where T is the COARSEST cascade step that divides S (and
  * every distinct-slot step) AND has a non-empty aligned interior for
  * the query's time range — a sub-day range falls through to a finer
  * level instead of raw. The cascade row (n, sum_cents, min_cents,
  * max_cents) is an exact monoid image of the raw rows it covers, so
  * count ⇒ sum(n), sum ⇒ sum(sum_cents), min ⇒ min(min_cents),
  * max ⇒ max(max_cents), avg ⇒ sum(sum_cents)/sum(n); the grain
  * columns' DISTINCT sets survive materialization (one cascade row per
  * grain tuple), so count(DISTINCT user_id/event_type/slot) and
  * approx_count_distinct (HLL++ is set-idempotent) re-aggregate
  * exactly. When T == S with the full grain grouped and no distinct
  * aggregates, the aggregation disappears entirely (a Project over
  * the cascade, ZERO shuffle). Substituted outputs keep the original
  * exprIds, so parent operators (HAVING filters, Sort+Limit top-k)
  * are untouched and compose.
  *
  * Scope guards (all must hold, else the plan is left alone):
  *  - `spark.graft.rollup.rewrite` is "true" (default off — ingest and
  *    cascade-maintenance jobs must never read the table they are
  *    writing; [[TsdbStore]] additionally never enables it);
  *  - the scan is a store base dir (`…/base` beside a `_LAYout` stamp)
  *    and the chosen `agg_T` table exists on the same filesystem;
  *  - the only plan between Aggregate and scan is column pruning
  *    and/or a Filter whose conjuncts each either touch series-identity
  *    columns ONLY (user_id / event_type — those transfer to the rollup
  *    verbatim) or are half-open `ts_us` range bounds whose literals
  *    are multiples of the scanned cascade step T (slot membership is
  *    decided by the floor-div, so every T-cell is entirely inside or
  *    outside such a range — the bound transfers EXACTLY as a slot_ts
  *    bound, plus a derived dt partition-prune twin). An UNALIGNED
  *    bound splits: the largest T-aligned interior serves from the
  *    cascade, the ≤2 sub-cell boundary pieces serve from raw rows
  *    (dt-pruned to ≤1 partition each) unioned as monoid tuples under
  *    one re-aggregation — arbitrary now()-anchored dashboard ranges
  *    fire the rewrite. Any other predicate shape blocks it;
  *  - aggregates are the monoid four over `cents` (avg = sum/n), plus
  *    count(DISTINCT …) of the GRAIN columns (user_id / event_type /
  *    a slot the scanned level divides — the cascade holds one row per
  *    grain tuple, so those distinct sets survive materialization;
  *    DAU/WAU dashboards never rescan raw). DISTINCT over anything
  *    else, and FILTER clauses, block.
  *
  * At 100 TB this is the difference between re-scanning raw samples
  * and reading ≤ |series|·(day/T) cascade rows: the same query text
  * gets the reference's "reads never touch raw" property with no
  * application-side dispatch. PlanAuditSpec pins the rewrite (agg_T in
  * the scan, base gone, zero exchanges in the T == S form) and
  * TsdbStoreSpec pins bit-identical results with the rule on and off.
  */
object RollupSubstitution {
  /** Optimize-time support cache, shared across queries and sessions
    * (VERDICT r7 next #4): the rewrite's fixed cost used to be
    * re-paid per optimized query — layout parse, per-table existence
    * probes, and (dominant) parquet SCHEMA INFERENCE for each fresh
    * cascade scan. All three are stable for the life of a store
    * layout, so they cache per store root, validated against the
    * `_LAYOUT` stamp's modification time (one getFileStatus per
    * optimize). File LISTINGS are deliberately NOT cached — an
    * incremental upsert swaps partition directories without touching
    * the stamp, and a stale listing would silently serve retired
    * files; the fresh listing is also exactly what the raw plan pays
    * for its own scan. */
  private[plans] final case class StoreInfo(
      stampMtime: Long,
      dataStamp: String,
      layout: graft.sources.StoreLayout,
      schemas: scala.collection.concurrent.TrieMap[String,
        org.apache.spark.sql.types.StructType],
      exists: scala.collection.concurrent.TrieMap[String, Boolean],
      gates: scala.collection.concurrent.TrieMap[String, Any])
  private[plans] val storeCache =
    new java.util.concurrent.ConcurrentHashMap[String, StoreInfo]()
  /** Count of optimize-time gate JOBS actually executed (dim
    * uniqueness, sub-K counts) — RollupSpec pins cache hits (a
    * repeated query must not move this) and invalidation (a store
    * mutation must). */
  private[graft] val gateJobsRun = new java.util.concurrent.atomic.AtomicLong(0L)
}

case class RollupSubstitution(session: SparkSession) extends Rule[LogicalPlan] {
  import RollupSubstitution.{StoreInfo, storeCache}

  private val FlagKey = "spark.graft.rollup.rewrite"
  /** Skip the rewrite unless the raw relation is at least this many
    * times larger than the chosen cascade table — at ≤ 1× the cascade
    * is not smaller than raw (a 1-sample-per-cell store) and the
    * rewrite can only add cost. Size is listing-bytes: the raw side's
    * is already computed by its own relation, the cascade side's is
    * one content summary of a |series|·(day/T)-row directory. */
  private val RatioKey = "spark.graft.rollup.minSizeRatio"
  private val FloorKey = "spark.graft.rollup.sizeGateFloorBytes"

  /** Cached per-store support data, revalidated against the layout
    * stamp AND the content stamp; a missing layout stamp (not a
    * store) returns None. The content stamp (`_DATA_STAMP`, bumped by
    * every TsdbStore mutator) additionally guards the GATE-JOB cache:
    * layout unchanged + content changed keeps the stable
    * schema/existence entries but drops every cached gate result, so
    * upsert / compaction / retention invalidate exactly the answers
    * they can change. An absent content stamp reads as "" and
    * [[cachedGate]] then never caches — stores written by anything
    * that doesn't maintain the stamp stay correct, just uncached. */
  private def storeInfo(store: String): Option[StoreInfo] = {
    val p = new org.apache.hadoop.fs.Path(s"$store/_LAYOUT")
    val fs = p.getFileSystem(session.sparkContext.hadoopConfiguration)
    val mtime = try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException => return None }
    val ds = TsdbStore.readDataStamp(session, store)
    Some(storeCache.compute(store, (_, old) =>
      if (old != null && old.stampMtime == mtime && old.dataStamp == ds) old
      else if (old != null && old.stampMtime == mtime)
        old.copy(dataStamp = ds,
          gates = scala.collection.concurrent.TrieMap.empty)
      else StoreInfo(mtime, ds, TsdbStore.readLayout(session, store),
        scala.collection.concurrent.TrieMap.empty,
        scala.collection.concurrent.TrieMap.empty,
        scala.collection.concurrent.TrieMap.empty)))
  }

  /** Serve a gate-job result from the store's content-stamped cache,
    * or run it. `keyOpt = None` (an input whose content can't be
    * fingerprinted) and an absent content stamp both degrade to
    * running the job — never to a stale answer. The map is bounded:
    * past `MaxGateEntries` a new key runs uncached rather than
    * growing driver memory without limit (the monotone global-bound
    * entries that matter are inserted long before any cap bites). */
  private val MaxGateEntries = 1024
  private def cachedGate[T](info: StoreInfo, keyOpt: Option[String])(run: => T): T = {
    def runCounted: T = {
      RollupSubstitution.gateJobsRun.incrementAndGet()
      run
    }
    keyOpt match {
      case Some(key) if info.dataStamp.nonEmpty =>
        info.gates.get(key) match {
          case Some(v) => v.asInstanceOf[T]
          case None =>
            val v = runCounted
            if (info.gates.size < MaxGateEntries) info.gates.update(key, v)
            v
        }
      case _ => runCounted
    }
  }

  /** Content fingerprint of a dim-side subtree: the canonicalized
    * structure plus every leaf scan's CURRENT file listing (writers
    * emit uuid-named files, so the path set identifies content). None
    * if any leaf is not a file scan — such plans are not cacheable.
    * Two hardenings (ADVICE r11):
    *  - a subtree carrying a SUBQUERY expression (scalar/IN/EXISTS
    *    over ANOTHER table) is never cacheable — the other table's
    *    content is invisible to this subtree's leaf listing and the
    *    store stamp, so a cached dimIsUnique/maxN verdict could go
    *    stale when only that table changes;
    *  - the key is a SHA-256 over the FULL untruncated plan string
    *    plus the full sorted path list — the previous 32-bit
    *    `hashCode` of the path seq and the maxToStringFields-truncated
    *    `toString` could in principle collide two distinct dim plans
    *    onto one gate-cache entry. */
  private def planSignature(p: LogicalPlan): Option[String] = {
    if (p.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[PlanExpression[_]])))) return None
    val leafSigs = p.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation =>
          val files = fsr.location.inputFiles.sorted
          Some(s"${fsr.location.rootPaths.mkString(",")}#${files.length}" +
            s"#${files.mkString("|")}#${fsr.location.sizeInBytes}")
        case _ => None
      }
      case _ => None
    }
    if (leafSigs.exists(_.isEmpty)) None
    else {
      val full = p.canonicalized.treeString(
        verbose = true, addSuffix = false, maxFields = Int.MaxValue,
        printOperatorId = false) + "@" + leafSigs.flatten.mkString(";")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      Some(md.digest(full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString)
    }
  }

  /** The live snapshot of a MANIFEST-layout store, cached under the
    * content stamp (every TsdbStore mutator bumps `_DATA_STAMP`, which
    * drops the gates map — so a repeated dashboard query pays one
    * manifest read per store mutation, not per optimize). A store
    * without a stamp never caches — correct, just uncached. */
  private def manifestSnapshot(info: StoreInfo, store: String)
      : graft.sources.StoreManifest.Snapshot = {
    def load() = graft.sources.StoreManifest.load(
      new org.apache.hadoop.fs.Path(store)
        .getFileSystem(session.sparkContext.hadoopConfiguration), store)
    if (info.dataStamp.isEmpty) load()
    else info.gates.getOrElseUpdate("manifest|snapshot", load())
      .asInstanceOf[graft.sources.StoreManifest.Snapshot]
  }

  /** On a manifest store, the rewrite is sound only against the LIVE
    * snapshot: the base relation's partition directories must be
    * EXACTLY the live snapshot's base entry set. A TIME-TRAVEL read
    * ([[TsdbStore.readTableAt]] against a retained older snapshot)
    * carries the same `_segs/…` path shape but a different directory
    * set — substituting the live cascade under it would silently
    * answer from the wrong snapshot (and a stats-pruned fetch
    * relation is likewise a strict subset). Set equality is the whole
    * test: when an old snapshot's base set coincides with the live
    * one the data is identical and substitution stays sound. Rename
    * layout reads pass trivially (one canonical `<root>/base` dir). */
  private def baseScanIsLive(info: StoreInfo, store: String,
                             rel: LogicalRelation): Boolean =
    info.layout.commit != "manifest" || {
      val scanned = rel.relation match {
        case f: HadoopFsRelation => f.location.rootPaths.map(_.toString).toSet
        case _ => return false
      }
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(session.sparkContext.hadoopConfiguration)
      val live = manifestSnapshot(info, store).entries.collect {
        case (("base", _), r) =>
          fs.makeQualified(new org.apache.hadoop.fs.Path(s"$store/$r")).toString
      }.toSet
      scanned == live
    }

  private def tableExistsCached(info: StoreInfo, store: String, table: String): Boolean =
    if (info.layout.commit == "manifest")
      manifestSnapshot(info, store).entries.keys.exists(_._1 == table)
    else info.exists.getOrElseUpdate(table, {
      val p = new org.apache.hadoop.fs.Path(s"$store/$table")
      p.getFileSystem(session.sparkContext.hadoopConfiguration).exists(p)
    })

  /** Fresh analyzed scan of a store table, with the (stable) schema
    * served from the cache — skips per-query schema inference, keeps
    * the per-query file listing. On a manifest store the scan resolves
    * through the LIVE snapshot ([[TsdbStore.readSnapshotTable]] — the
    * same single-relation explicit-PartitionSpec read every fetch
    * uses), so the substituted cascade is read under the same commit
    * protocol as the base scan it replaces. Snapshot skew note: the
    * base relation was resolved when the query was BUILT, the cascade
    * here at optimize time — under the store's single-writer contract
    * a mutation between the two is the same read-skew class the
    * rename layout's table-at-a-time swaps expose, and a dashboard
    * re-running the query closes it. */
  private def tableScan(info: StoreInfo, store: String, table: String)
      : org.apache.spark.sql.DataFrame =
    if (info.layout.commit == "manifest") {
      val snap = manifestSnapshot(info, store)
      val dataSchema = info.schemas.getOrElseUpdate(table, {
        val rel = snap.entries.collectFirst {
          case ((t, _), r) if t == table => r
        }.getOrElse(sys.error(s"no live entry for $table at $store"))
        session.read.parquet(s"$store/$rel").schema
      })
      TsdbStore.readSnapshotTable(session, store, info.layout, snap,
        table, Some(dataSchema))
    } else {
      val path = s"$store/$table"
      val schema = info.schemas.getOrElseUpdate(table,
        session.read.parquet(path).schema)
      session.read.schema(schema).parquet(path)
    }

  /** The stats-based skip gate: proceed only when the raw side out-
    * sizes the cascade by the configured ratio (default 1.0 — decline
    * only the genuinely pathological cascade-not-smaller stores, e.g.
    * one sample per cell, where the rewrite can only add cost; raise
    * the ratio to demand a margin, 0 disables). Listing bytes are the
    * signal, and they are only TRUSTWORTHY once per-file parquet
    * overhead is amortized — below the floor (default 16 MB) a
    * 1000-row cascade "outweighs" a 1000-row base on metadata alone
    * while both plans are trivially cheap, so the gate stands aside
    * and the rewrite keeps its plan-quality wins (pruning, no
    * shuffle, no window sort). */
  private def sizeGateOk(info: StoreInfo, rel: LogicalRelation,
                         store: String, table: String): Boolean = {
    val ratio = session.conf.get(RatioKey, "1.0").toDouble
    if (ratio <= 0.0) return true
    val baseBytes = rel.relation match {
      case fsr: HadoopFsRelation => fsr.location.sizeInBytes
      case _ => return true
    }
    val floor = session.conf.get(FloorKey, (16L << 20).toString).toLong
    if (baseBytes < floor) return true
    val cascadeBytes =
      if (info.layout.commit == "manifest") {
        // the snapshot's per-entry byte stats ARE the content summary
        // (zero filesystem calls); an entry without stats falls back
        // to one directory summary
        val snap = manifestSnapshot(info, store)
        snap.entries.collect { case (k @ (t, _), relDir) if t == table =>
          snap.stats.get(k).flatMap(_.bytes).getOrElse {
            val p = new org.apache.hadoop.fs.Path(s"$store/$relDir")
            p.getFileSystem(session.sparkContext.hadoopConfiguration)
              .getContentSummary(p).getLength
          }
        }.sum
      } else {
        val p = new org.apache.hadoop.fs.Path(s"$store/$table")
        p.getFileSystem(session.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      }
    baseBytes.toDouble >= ratio * cascadeBytes.toDouble
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!session.conf.get(FlagKey, "false").toBoolean) return plan
    plan.transformUp {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteQuantile(agg))
          .orElse(tryRewriteRate(agg)).getOrElse(agg)
    }
  }

  /** (ts_us div S·10⁶) · S — the engine's canonical slot quantization
    * (TimeSeriesOps.slotSec). Returns S. */
  private object SlotExpr {
    def unapply(e: Expression): Option[(AttributeReference, Long)] = e match {
      case Multiply(
          IntegralDivide(ts: AttributeReference, Literal(stepUs: Long, LongType), _),
          Literal(stepSec: Long, LongType), _)
          if ts.name == "ts_us" && stepSec > 0 && stepUs == stepSec * 1000000L =>
        Some((ts, stepSec))
      case _ => None
    }
  }

  /** Unwrap the plans the optimizer leaves between an Aggregate and
    * its scan: column-pruning Projects, the grouping-expression
    * pull-out Project (PullOutGroupingExpressions aliases complex
    * groupings below the Aggregate), and a series-only Filter. Returns
    * (relation, filter condition, exprId → relation-level expression)
    * so grouping/aggregate expressions can be resolved back to the raw
    * columns they compute over. */
  private def unwrap(p: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression], Map[ExprId, Expression])] =
    p match {
      case rel: LogicalRelation => Some((rel, None, Map.empty))
      case Project(projList, child) =>
        unwrap(child).flatMap { case (rel, c0, m0) =>
          def resolve(e: Expression): Expression = e.transform {
            case a: AttributeReference if m0.contains(a.exprId) => m0(a.exprId)
          }
          val entries = projList.map {
            case a: AttributeReference => Some(a.exprId -> resolve(a))
            case al: Alias => Some(al.exprId -> resolve(al.child))
            case _ => None
          }
          if (entries.contains(None)) None
          else Some((rel, c0, entries.flatten.toMap))
        }
      case Filter(cond, child) =>
        unwrap(child).map { case (rel, c0, m) =>
          // resolve the condition through the projections BELOW the
          // filter right here — the map returned upward carries only
          // the outermost project's entries, so a later resolve could
          // miss these exprIds. Whether the resolved condition may
          // transfer at all is validated in tryRewrite against the
          // relation's own attributes (ADVICE r6 #2).
          val rc = cond.transform {
            case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
          }
          (rel, Some(c0.map(And(_, rc)).getOrElse(rc)), m) }
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** The store root when the relation scans the BASE table of an
    * ingested [[TsdbStore]] layout — either the rename layout's
    * `<root>/base` directory (one root path), or a manifest-layout
    * snapshot read, whose root paths are the live dt partition dirs
    * `<root>/_segs/<segId>/base/dt=…` (round 15, VERDICT r14 next #1:
    * without this arm the cascade rewrite silently declined on exactly
    * the object-store layout a 100 TB deployment would use). Every
    * root path must take one of the two shapes and resolve to the SAME
    * `_LAYOUT`-stamped root. */
  private def storeRootOf(rel: LogicalRelation): Option[String] = rel.relation match {
    case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty =>
      def rootOf(p: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] =
        if (p.getName == "base") Option(p.getParent) // rename layout
        else if (p.getName.startsWith("dt=")) // manifest segment leaf
          Option(p.getParent).filter(_.getName == "base")
            .flatMap(t => Option(t.getParent))
            .flatMap(seg => Option(seg.getParent))
            .filter(_.getName == "_segs")
            .flatMap(segs => Option(segs.getParent))
        else None
      val roots = fs.location.rootPaths.map(rootOf)
      if (roots.exists(_.isEmpty)) None
      else roots.flatten.distinct match {
        case Seq(root) =>
          val hfs = root.getFileSystem(session.sparkContext.hadoopConfiguration)
          if (hfs.exists(new org.apache.hadoop.fs.Path(root, "_LAYOUT")))
            Some(root.toString)
          else None
        case _ => None
      }
    case _ => None
  }

  /** A series-key-preserving dimension join peeled from between the
    * Aggregate and the base scan (VERDICT r7 next #3): `dim` is the
    * untouched dim-side subtree (exprIds preserved), `pairs` the
    * equi-join pairs as (base identity column name, dim attribute),
    * `node` the original Join (for its hint). */
  private case class DimJoin(dim: LogicalPlan,
                             pairs: Seq[(String, Attribute)],
                             node: Join)

  /** Multiplicity gate shared by the value and quantile paths: the dim
    * side must be UNIQUE on its join keys, else a base row could match
    * several dim rows and the cascade's collapsed cells would
    * under-count the fan-out. Runtime check at optimize time, bounded
    * by contract (a metadata sidecar is version-count-sized, not
    * sample-sized) — and CACHED per (content-stamped store, dim
    * fingerprint, key positions), so a dashboard re-firing the same
    * query pays this job once per store mutation, not once per query. */
  private def dimIsUnique(info: StoreInfo, dj: DimJoin): Boolean = {
    val key = planSignature(dj.dim).map { sig =>
      val keyPos = dj.pairs
        .map(p => dj.dim.output.indexWhere(_.exprId == p._2.exprId))
      s"dimUnique|${keyPos.mkString(",")}|$sig"
    }
    cachedGate(info, key) {
      val dimDf = org.apache.spark.sql.graftshim.DatasetBridge
        .ofRows(session, dj.dim)
      val keyCols = dj.pairs.map(p =>
        org.apache.spark.sql.graftshim.ColumnBridge.column(p._2))
      dimDf.groupBy(keyCols: _*)
        .agg(org.apache.spark.sql.functions
          .count(org.apache.spark.sql.functions.lit(1)).as("c"))
        .filter(org.apache.spark.sql.functions.col("c") > 1)
        .limit(1).collect().isEmpty
    }
  }

  /** [[unwrap]] extended one level: the plan may be
    * [Project/Filter]* → Join(base-side, dim-side) where the base side
    * unwraps to a store relation and the join is INNER on
    * series-identity columns only. Everything the join adds is handled
    * by the caller: the dim subtree is reused verbatim (its exprIds
    * survive), so dim-side grouping keys and outputs pass through the
    * conversion untouched. A join that doesn't match simply means no
    * rewrite (the rate path never unwraps joins; the quantile path
    * does, round 9, merging sketches per dim group). */
  private def unwrapMaybeJoin(p: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression], Map[ExprId, Expression],
                Option[DimJoin])] = {
    def splitJoin(j: Join): Option[(LogicalRelation, Option[Expression],
        Map[ExprId, Expression], Option[DimJoin])] = {
      if (j.joinType != Inner || j.condition.isEmpty) return None
      // base side on the left or the right; the OTHER side is the dim
      def trySide(baseSide: LogicalPlan, dimSide: LogicalPlan)
          : Option[(LogicalRelation, Option[Expression],
                    Map[ExprId, Expression], Option[DimJoin])] =
        unwrap(baseSide).flatMap { case (rel, c0, m) =>
          if (storeRootOf(rel).isEmpty) None
          else {
            val identityIds = rel.output
              .filter(a => a.name == "user_id" || a.name == "event_type")
              .map(a => a.exprId -> a.name).toMap
            def resolveB(e: Expression): Expression = e.transform {
              case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
            }
            val dimIds = dimSide.outputSet
            val pairs = splitConjuncts(j.condition.get).map {
              case EqualTo(l, r) =>
                val (b, d) = (resolveB(l), r) match {
                  case (bb: AttributeReference, dd: Attribute)
                      if identityIds.contains(bb.exprId) && dimIds.contains(dd) =>
                    (bb, dd)
                  case _ => (resolveB(r), l) match {
                    case (bb: AttributeReference, dd: Attribute)
                        if identityIds.contains(bb.exprId) && dimIds.contains(dd) =>
                      (bb, dd)
                    case _ => return None
                  }
                }
                identityIds(b.exprId) -> d
              case _ => return None
            }
            if (pairs.isEmpty) None
            else Some((rel, c0, m, Some(DimJoin(dimSide, pairs, j))))
          }
        }
      trySide(j.left, j.right).orElse(trySide(j.right, j.left))
    }
    p match {
      case j: Join => splitJoin(j)
      case Project(projList, child) =>
        unwrapMaybeJoin(child).flatMap { case (rel, c0, m0, dj) =>
          def resolve(e: Expression): Expression = e.transform {
            case a: AttributeReference if m0.contains(a.exprId) => m0(a.exprId)
          }
          val entries = projList.map {
            case a: AttributeReference => Some(a.exprId -> resolve(a))
            case al: Alias => Some(al.exprId -> resolve(al.child))
            case _ => None
          }
          if (entries.contains(None)) None
          else Some((rel, c0, m0 ++ entries.flatten.toMap, dj))
        }
      case Filter(cond, child) =>
        unwrapMaybeJoin(child).map { case (rel, c0, m, dj) =>
          val rc = cond.transform {
            case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
          }
          (rel, Some(c0.map(And(_, rc)).getOrElse(rc)), m, dj)
        }
      case other => unwrap(other).map { case (rel, c0, m) => (rel, c0, m, None) }
    }
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (rel, cond, exprMap, dimJoin) = unwrapMaybeJoin(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    val store = storeRootOf(rel) match {
      case Some(s) => s
      case None => return None
    }
    def resolve(e: Expression): Expression = e.transform {
      case a: AttributeReference if exprMap.contains(a.exprId) => exprMap(a.exprId)
    }
    // classify the filter's conjuncts. Identity conjuncts transfer
    // verbatim — the rebase below maps attributes onto the cascade BY
    // NAME, which is sound only once every reference is proven (by
    // exprId) to be the relation's actual user_id / event_type
    // attribute; an alias masquerading under those names that resolved
    // to anything else blocks the rewrite (ADVICE r6 #2). Half-open
    // ts_us bounds are collected for the alignment check below
    // (VERDICT r6 #1); any other conjunct blocks the rewrite.
    val identityIds = rel.output
      .filter(a => a.name == "user_id" || a.name == "event_type")
      .map(_.exprId).toSet
    val tsUsId = rel.output.find(_.name == "ts_us").map(_.exprId)
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => tsUsId.contains(a.exprId)
      case _ => false
    }
    val eidId = rel.output.find(_.name == "event_id").map(_.exprId)
    def isEid(e: Expression): Boolean = e match {
      case a: AttributeReference => eidId.contains(a.exprId)
      case _ => false
    }
    // the repo-wide series order key struct(ts_us, event_id) — the
    // ordering under which min_by/max_by(cents, ·) IS the cell's
    // first/last sample (M4's endpoint pair)
    def isSeriesOrder(o: Expression): Boolean = o match {
      case cns: CreateNamedStruct => cns.valExprs match {
        case Seq(t, ei) => isTs(t) && isEid(ei)
        case _ => false
      }
      case _ => false
    }
    var seriesCond: Option[Expression] = None
    var lowerUs = Seq.empty[Long] // conjuncts of the form ts_us >= L
    var upperUs = Seq.empty[Long] // conjuncts of the form ts_us <  U
    cond.toSeq.flatMap(splitConjuncts).foreach {
      case c if c.references.nonEmpty &&
          c.references.forall(a => identityIds.contains(a.exprId)) =>
        seriesCond = Some(seriesCond.map(And(_, c)).getOrElse(c))
      case GreaterThanOrEqual(t, Literal(l: Long, LongType)) if isTs(t) =>
        lowerUs :+= l
      case LessThanOrEqual(Literal(l: Long, LongType), t) if isTs(t) =>
        lowerUs :+= l
      case LessThan(t, Literal(u: Long, LongType)) if isTs(t) =>
        upperUs :+= u
      case GreaterThan(Literal(u: Long, LongType), t) if isTs(t) =>
        upperUs :+= u
      case _ => return None
    }
    // grouping: ANY subset of {user_id, event_type, slot(S)} —
    // groupBy(user_id, event_type, slot) is the per-series fetch shape,
    // groupBy(event_type, slot) the fleet-wide dashboard rollup,
    // groupBy(slot) the whole-store profile, groupBy(user_id,
    // event_type) the per-series RANGE TOTAL (the commonest dashboard
    // query of all), and the empty grouping a whole-store total; all
    // are monoid images of the cascade (dropping a key or the slot
    // just re-aggregates more rows into coarser groups)
    var stepSec = 0L
    var hasUid = false; var hasEtype = false
    var baseKeys = 0
    var ok = true
    val dimOutputIds: AttributeSet =
      dimJoin.map(_.dim.outputSet).getOrElse(AttributeSet.empty)
    // resolved grouping expressions in original order — dim-side keys
    // (references entirely inside the untouched dim subtree) pass
    // through the rewrite verbatim
    val resolvedGroupings = agg.groupingExpressions.map(resolve)
    resolvedGroupings.foreach {
      case a: AttributeReference if a.name == "user_id" =>
        hasUid = true; baseKeys += 1
      case a: AttributeReference if a.name == "event_type" =>
        hasEtype = true; baseKeys += 1
      case SlotExpr(ts, s) if isTs(ts) =>
        // two slot expressions at DIFFERENT steps would silently keep
        // only the last and regroup both at it (ADVICE r6 #1):
        // duplicate identity keys are harmless, duplicate steps are not
        if (stepSec != 0L && stepSec != s) ok = false
        else { stepSec = s; baseKeys += 1 }
      case e if e.references.nonEmpty && e.references.subsetOf(dimOutputIds) => ()
      case _ => ok = false
    }
    if (!ok || baseKeys > 3) return None
    // aggregates REFERENCING the dim side survive the rewrite only
    // when they are multiplicity-insensitive: the cascade collapses
    // each (series, T-slot) cell to ONE row, so per-cell repetition of
    // the (unique-join) dim value is lost — count(DISTINCT dim) /
    // min(dim) / max(dim) see the same SET either way, while
    // sum/avg/count over dim values would silently change. Their
    // presence also forces the re-aggregating path (a surviving
    // AggregateExpression cannot live in the exact path's Project).
    var hasDimAgg = false
    val dimAggBad = agg.aggregateExpressions.exists(_.exists {
      case ag: AggregateExpression
          if ag.references.exists(dimOutputIds.contains) =>
        hasDimAgg = true
        !(ag.references.subsetOf(dimOutputIds) && (ag.aggregateFunction match {
          case _: Count => ag.isDistinct
          case _: Min | _: Max => !ag.isDistinct
          case _ => false
        }))
      case _ => false
    })
    if (dimAggBad) return None
    // slot steps appearing inside count(DISTINCT slot(s)) operands —
    // "active periods" aggregates. The scanned level must divide these
    // too, or the distinct projection below would conflate cells
    val distinctSlotSteps: Seq[Long] = agg.aggregateExpressions.flatMap(_.collect {
      case AggregateExpression(Count(Seq(c)), Complete, true, None, _) =>
        resolve(c) match {
          case SlotExpr(ts2, s) if isTs(ts2) => Some(s)
          case _ => None
        }
    }.flatten)
    // coarsest materialized step dividing the query's slot step (and
    // every distinct-slot step) WHOSE ALIGNED INTERIOR IS NON-EMPTY
    // for the query's range: a range shorter than one coarse cell
    // (the "totals for the last 6 hours" slotless dashboard) falls
    // through to a finer level instead of rescanning raw. A slotless
    // aggregate (stepSec = 0) re-aggregates ANY level (0 % s == 0 for
    // every s), so only the range constrains its choice.
    val info = storeInfo(store) match {
      case Some(x) => x
      case None => return None
    }
    if (!baseScanIsLive(info, store, rel)) return None
    val layout = info.layout
    val loOpt = lowerUs.maxOption
    val hiOpt = upperUs.minOption
    // the alignment math below floors (Math.floorDiv) while the slot
    // quantization the query itself evaluates (SlotExpr's
    // IntegralDivide) truncates toward zero — the two disagree for
    // negative ts_us, so pre-1970 bounds would mis-assign boundary
    // rows between the interior and the raw pieces. The store never
    // ingests negative timestamps, so simply leave such plans alone
    // (ADVICE r7 #1)
    if (loOpt.exists(_ < 0L) || hiOpt.exists(_ < 0L)) return None
    def interiorNonEmpty(tc: Long): Boolean = (loOpt, hiOpt) match {
      case (Some(l), Some(h)) =>
        val su = tc * 1000000L
        Math.floorDiv(l + su - 1, su) * su < Math.floorDiv(h, su) * su
      case _ => true // unbounded on a side: the interior is unbounded too
    }
    val t = layout.steps
      .filter(s => stepSec % s == 0 && distinctSlotSteps.forall(_ % s == 0))
      .sorted.reverse
      .find(s => tableExistsCached(info, store, s"agg_$s") &&
        interiorNonEmpty(s)) match {
      case Some(x) => x
      case None => return None
    }
    // stats gate: a finer level is only LARGER, so a failed gate is a
    // decline, not a fall-through
    if (!sizeGateOk(info, rel, store, s"agg_$t")) return None

    // a half-open ts_us range transfers EXACTLY as slot bounds iff its
    // bounds are multiples of the SCANNED cascade step T: each T-cell
    // is then entirely inside or entirely outside the range. An
    // UNALIGNED bound splits into the largest T-aligned INTERIOR
    // (served from the cascade) plus a sub-cell BOUNDARY piece (served
    // from ≤ a partition's worth of raw rows) unioned as monoid tuples
    // under one re-aggregation — the shape arbitrary now()-anchored
    // dashboard ranges actually hit. Bounds conjoin, so the effective
    // range is [max(lowers), min(uppers)).
    val stepUs = t * 1000000L
    val bupUs = loOpt.map(l => Math.floorDiv(l + stepUs - 1, stepUs) * stepUs)
    val edownUs = hiOpt.map(h => Math.floorDiv(h, stepUs) * stepUs)
    (bupUs, edownUs) match {
      // no T-aligned interior at all (the whole range is inside one
      // cell, or empty): nothing to serve from the cascade — stay raw
      case (Some(b), Some(e)) if b >= e => return None
      case _ => ()
    }
    // boundary pieces, each nonempty only when its bound is unaligned
    val leftPiece = for { l <- loOpt; b <- bupUs if l < b } yield (l, b)
    val rightPiece = for { h <- hiOpt; e <- edownUs if e < h } yield (e, h)
    val pieces = leftPiece.toSeq ++ rightPiece.toSeq

    // fresh analyzed scan of the cascade table (new exprIds throughout)
    val cascade = tableScan(info, store, s"agg_$t").queryExecution.analyzed
    def att(name: String): AttributeReference =
      cascade.output.find(_.name == name).get match { case a: AttributeReference => a }
    val (uid, etype, slot) = (att("user_id"), att("event_type"), att("slot_ts"))
    val (nC, sumC, minC, maxC) =
      (att("n"), att("sum_cents"), att("min_cents"), att("max_cents"))
    // M4 endpoint pair (round 10): first/last = lexicographic struct
    // min/max of (ts_us, event_id, cents) per cell — present on stores
    // ingested since the cascade grew the columns; a query using the
    // min_by/max_by endpoint shape against an older store declines
    val usesEndpoint = agg.aggregateExpressions.exists(_.exists {
      case AggregateExpression(_: MinBy | _: MaxBy, _, _, _, _) => true
      case _ => false
    })
    val firstCOpt = cascade.output.collectFirst {
      case a: AttributeReference if a.name == "first" => a }
    val lastCOpt = cascade.output.collectFirst {
      case a: AttributeReference if a.name == "last" => a }
    if (usesEndpoint && (firstCOpt.isEmpty || lastCOpt.isEmpty)) return None
    // cascade-side predicate: identity conjuncts rebased by (validated)
    // name, the INTERIOR as slot_ts bounds, plus dt partition-prune
    // twins — slot_ts is a data column, and the planner cannot derive
    // the dt partition key from it (the same reason TsdbStore.slotRead
    // filters dt explicitly)
    val rebasedSeries: Seq[Expression] = seriesCond.toSeq.map(_.transform {
      case a: AttributeReference => att(a.name)
    })
    val slotBounds: Seq[Expression] =
      bupUs.map(b => GreaterThanOrEqual(slot, Literal(b / 1000000L, LongType))).toSeq ++
      edownUs.map(e => LessThan(slot, Literal(e / 1000000L, LongType))).toSeq
    def dtLit(sec: Long): Expression = {
      val day = java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))
      if (layout.monthly)
        Literal.create(f"${day.getYear}%04d-${day.getMonthValue}%02d",
          org.apache.spark.sql.types.StringType)
      else Literal(day.toEpochDay.toInt, org.apache.spark.sql.types.DateType)
    }
    val dtBounds: Seq[Expression] =
      cascade.output.collect { case a: AttributeReference if a.name == "dt" => a }
        .headOption.toSeq.flatMap { dt =>
          // exclusive upper bound: derive the dt literal from the LAST
          // INCLUDED second, not the bound itself — a bound exactly on
          // a day/month boundary would otherwise keep one extra
          // partition the slot_ts filter then empties (ADVICE r7 #2)
          bupUs.map(b => GreaterThanOrEqual(dt, dtLit(b / 1000000L))).toSeq ++
          edownUs.map(e => LessThanOrEqual(dt, dtLit((e - 1L) / 1000000L))).toSeq
        }
    val interior: LogicalPlan =
      (rebasedSeries ++ slotBounds ++ dtBounds).reduceOption(And) match {
        case Some(c) => Filter(c, cascade)
        case None => cascade
      }

    // a boundary piece as a union branch: raw rows of [loUs, hiUs)
    // mapped to the cascade's monoid-tuple shape (n=1, cents³). One
    // branch per piece — plain per-branch conjuncts keep the dt
    // partition-filter extraction live, where an OR across pieces
    // would defeat it.
    def rawPiece(loUs: Long, hiUs: Long): LogicalPlan = {
      val base = tableScan(info, store, "base").queryExecution.analyzed
      def batt(n: String): AttributeReference =
        base.output.find(_.name == n).get match { case a: AttributeReference => a }
      val (bu, be, bts, bc) =
        (batt("user_id"), batt("event_type"), batt("ts_us"), batt("cents"))
      def rowStruct: Expression = CreateNamedStruct(Seq(
        Literal("ts_us"), bts, Literal("event_id"), batt("event_id"),
        Literal("cents"), bc))
      val series2 = seriesCond.toSeq.map(_.transform {
        case a: AttributeReference => batt(a.name)
      })
      val tsB: Seq[Expression] = Seq(
        GreaterThanOrEqual(bts, Literal(loUs, LongType)),
        LessThan(bts, Literal(hiUs, LongType)))
      val dtB: Seq[Expression] =
        base.output.collect { case a: AttributeReference if a.name == "dt" => a }
          .headOption.toSeq.flatMap { d => Seq(
            GreaterThanOrEqual(d, dtLit(Math.floorDiv(loUs, 1000000L))),
            LessThanOrEqual(d, dtLit(Math.floorDiv(hiUs - 1, 1000000L)))) }
      val slotRaw = Multiply(
        IntegralDivide(bts, Literal(stepUs, LongType)), Literal(t, LongType))
      Project(Seq(
          Alias(bu, "user_id")(), Alias(be, "event_type")(),
          Alias(slotRaw, "slot_ts")(),
          Alias(Literal(1L, LongType), "n")(),
          Alias(bc, "sum_cents")(), Alias(bc, "min_cents")(),
          Alias(bc, "max_cents")()) ++
          (if (usesEndpoint)
             Seq(Alias(rowStruct, "first")(), Alias(rowStruct, "last")())
           else Nil),
        Filter((series2 ++ tsB ++ dtB).reduce(And), base))
    }

    // source of the re-aggregation: the filtered cascade alone (the
    // aligned fast path — exact hits stay a pure Project), or the
    // cascade interior unioned with the boundary pieces
    val (child2a, uidR, etypeR, slotR, nR, sumR, minR, maxR, firstR, lastR) =
      if (pieces.isEmpty)
        (interior: LogicalPlan, uid: Attribute, etype: Attribute,
          slot: Attribute, nC: Expression, sumC: Expression,
          minC: Expression, maxC: Expression,
          firstCOpt: Option[Expression], lastCOpt: Option[Expression])
      else {
        val branch0 = Project(
          Seq(uid, etype, slot, nC, sumC, minC, maxC) ++
            (if (usesEndpoint) Seq(firstCOpt.get, lastCOpt.get) else Nil),
          interior)
        val u = Union(branch0 +: pieces.map { case (l, h) => rawPiece(l, h) })
        val out = u.output
        val (fU, lU) =
          if (usesEndpoint) (Some(out(7): Expression), Some(out(8): Expression))
          else (None, None)
        (u: LogicalPlan, out(0): Attribute, out(1): Attribute,
          out(2): Attribute, out(3): Expression, out(4): Expression,
          out(5): Expression, out(6): Expression, fU, lU)
      }

    // a series-key-preserving dim join rides ALONG the substitution:
    // the (orders-of-magnitude smaller) cascade source rejoins the
    // UNTOUCHED dim subtree on the same keys — correct because every
    // raw row of a cascade cell shares the cell's (user_id,
    // event_type), so the unique-dim inner join matches a cell's rows
    // all-or-nothing and adds the same dim values to each. Enriched
    // dashboard rollups (base ⋈ metadata, grouped by a dim attribute)
    // skip raw like plain ones; the broadcast hint, if any, carries
    // over with the join node's own hint
    val child2: LogicalPlan = dimJoin match {
      case None => child2a
      case Some(dj) =>
        if (!dimIsUnique(info, dj)) return None
        val cond2 = dj.pairs.map { case (name, d) =>
          EqualTo(if (name == "user_id") uidR else etypeR, d): Expression
        }.reduce(And)
        Join(child2a, dj.dim, Inner, Some(cond2), dj.node.hint)
    }

    // exact hit = the cascade's own granularity requested with no
    // boundary pieces: cascade rows ARE the answer rows. Dropping a
    // key, coarsening the step, or a split range re-aggregates. A
    // DISTINCT (or approx-distinct) aggregate always re-aggregates —
    // its replacement is itself an AggregateExpression, which a pure
    // Project can't host; so does a (multiplicity-insensitive)
    // dim-side aggregate, which survives as-is and needs an Aggregate
    // to evaluate it
    val hasDistinct = agg.aggregateExpressions.exists(_.exists {
      case ag: AggregateExpression =>
        ag.isDistinct || ag.aggregateFunction.isInstanceOf[HyperLogLogPlusPlus]
      case _ => false
    })
    val exact = pieces.isEmpty && t == stepSec && hasUid && hasEtype &&
      !hasDistinct && !hasDimAgg
    def ae(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)
    // slotless aggregates never reference a slot output, so slot2 is
    // never used there (guarded below — the div-by-0 is unreachable)
    val slot2: Expression =
      if (t == stepSec || stepSec == 0L) slotR // step-aligned: regrouping is identity
      else Multiply(IntegralDivide(slotR, Literal(stepSec, LongType)),
        Literal(stepSec, LongType))
    // count(1) over base rows is non-nullable; sum(n) over a (always
    // non-empty) cascade GROUP never evaluates to null — KnownNotNull
    // keeps the substituted output's nullability identical. The one
    // exception is the GLOBAL (empty-grouping) aggregate over an empty
    // source: count(1) = 0 but sum(n) = NULL, so the global form
    // coalesces to 0 (sum/min/max stay NULL in both plans there).
    val global = !hasUid && !hasEtype && stepSec == 0L
    val countRepl: Expression = KnownNotNull(
      if (exact) nR
      else if (global) Coalesce(Seq(ae(Sum(nR)), Literal(0L, LongType)))
      else ae(Sum(nR)))
    val sumRepl: Expression = if (exact) sumR else ae(Sum(sumR))
    val minRepl: Expression = if (exact) minR else ae(Min(minR))
    val maxRepl: Expression = if (exact) maxR else ae(Max(maxR))
    // min_by/max_by(cents, struct(ts_us, event_id)) ⇒ the stored
    // endpoint struct's cents field: the struct is the lexicographic
    // min/max over (ts_us, event_id, cents) and (ts_us, event_id) is
    // UNIQUE, so the struct min/max picks exactly the argmin/argmax
    // row and its value rides along — coarser groups re-minimize over
    // cell structs (a monoid), boundary pieces contribute row structs
    def endCents(e: Expression): Expression = GetStructField(e, 2, Some("cents"))
    val firstRepl: Option[Expression] =
      firstR.map(f => endCents(if (exact) f else ae(Min(f))))
    val lastRepl: Option[Expression] =
      lastR.map(l => endCents(if (exact) l else ae(Max(l))))
    // avg = sum/n — the cascade stores both halves of the fraction, so
    // average (the reference's default consolidation function)
    // substitutes as one division over the monoid image. Spark's raw
    // Average accumulates a DOUBLE running sum over the samples; the
    // substituted form divides the EXACT integer sum — bit-identical
    // whenever the double accumulation is exact (every partial sum an
    // integer below 2^53), and strictly MORE accurate beyond. LEGACY
    // eval mode mirrors Average's own internal division (the
    // denominator is never 0 anyway: groups only exist where rows do,
    // and the empty global input propagates NULL before the division)
    def dbl(e: Expression): Expression = Cast(e, DoubleType)
    val avgRepl: Expression =
      if (exact) Divide(dbl(sumR), dbl(nR), EvalMode.LEGACY)
      else Divide(dbl(ae(Sum(sumR))), dbl(ae(Sum(nR))), EvalMode.LEGACY)

    // substitute aggregate leaves and grouping references inside each
    // output expression — arbitrary derived outputs (CollapseProject
    // folds things like sum/count arithmetic into the Aggregate's
    // output list) survive as long as every leaf converts. transform
    // recurses into replacement subtrees, so replacement-side
    // attributes must pass through untouched (the exprId guard).
    val newIds = child2.output.map(_.exprId).toSet
    var failed = false
    def convert(e: Expression): Expression = e.transform {
      // count(DISTINCT <grain column>) is exact over the cascade:
      // agg_T already holds one row per (user_id, event_type, T-slot),
      // so the grain columns' distinct SETS survive materialization
      // untouched — sets are a semilattice, coarser groups just union
      // cells, and the final DISTINCT dedups across cells (boundary
      // pieces included). count(DISTINCT user_id) — the DAU/WAU
      // dashboard — never rescans raw. Any other DISTINCT operand
      // lost its multiplicities in the cascade and blocks; without
      // these two cases the generic attribute fallback below would
      // leave an AggregateExpression inside the exact path's Project
      case ag @ AggregateExpression(Count(Seq(c)), Complete, true, None, _)
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        def distinctOver(op: Expression): Expression =
          AggregateExpression(Count(Seq(op)), Complete, isDistinct = true)
        resolve(c) match {
          case a: AttributeReference if a.name == "user_id" => distinctOver(uidR)
          case a: AttributeReference if a.name == "event_type" => distinctOver(etypeR)
          case SlotExpr(ts2, s) if isTs(ts2) && s % t == 0 =>
            distinctOver(
              if (s == t) slotR
              else Multiply(IntegralDivide(slotR, Literal(s, LongType)),
                Literal(s, LongType)))
          case _ => failed = true; ag
        }
      // decline branches return AG (the matched node), never the outer
      // expression e: transformDown descends into whatever a rule
      // returns, so returning e from a node NESTED inside it (e.g. a
      // cast-wrapped unsupported aggregate) re-wraps one level per
      // visit and recurses without bound (round-10 StackOverflow)
      case ag @ AggregateExpression(f, Complete, false, None, _)
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        f match {
          // non-null literals only: count(NULL) counts zero rows, not
          // sum(n) — NullPropagation normally folds it away first, but
          // the rewrite must not depend on that (ADVICE r6 #3)
          case Count(Seq(Literal(v, _))) if v != null => countRepl
          case Sum(c, _) => resolve(c) match {
            case a: AttributeReference if a.name == "cents" => sumRepl
            case _ => failed = true; ag
          }
          case Min(c) => resolve(c) match {
            case a: AttributeReference if a.name == "cents" => minRepl
            case _ => failed = true; ag
          }
          case Max(c) => resolve(c) match {
            case a: AttributeReference if a.name == "cents" => maxRepl
            case _ => failed = true; ag
          }
          case MinBy(v, o) => (resolve(v), resolve(o)) match {
            case (a: AttributeReference, o2)
                if a.name == "cents" && isSeriesOrder(o2) &&
                  firstRepl.isDefined => firstRepl.get
            case _ => failed = true; ag
          }
          case MaxBy(v, o) => (resolve(v), resolve(o)) match {
            case (a: AttributeReference, o2)
                if a.name == "cents" && isSeriesOrder(o2) &&
                  lastRepl.isDefined => lastRepl.get
            case _ => failed = true; ag
          }
          case Average(c, _) => resolve(c) match {
            case a: AttributeReference if a.name == "cents" => avgRepl
            case _ => failed = true; ag
          }
          // approx_count_distinct substitutes like count(DISTINCT):
          // HLL++ register updates are SET-idempotent (max of rho per
          // bucket), so feeding each grain tuple once — the cascade's
          // rows — yields bit-identical registers, hence a bit-identical
          // estimate, to feeding every raw row. Same relativeSD carries
          // over; hasDistinct above forces the re-aggregating path
          case hll @ HyperLogLogPlusPlus(c, _, _, _) => resolve(c) match {
            case a: AttributeReference if a.name == "user_id" =>
              ae(hll.copy(child = uidR))
            case a: AttributeReference if a.name == "event_type" =>
              ae(hll.copy(child = etypeR))
            case _ => failed = true; ag
          }
          case _ => failed = true; ag
        }
      // any OTHER aggregate over old attributes — FILTER clauses,
      // distinct over non-grain operands, multi-arg distincts,
      // non-Complete modes — must BLOCK here: the attribute fallback
      // below would otherwise rewrite its children and leave a
      // half-converted aggregate over cascade rows (silently wrong
      // counts), or on the exact path an AggregateExpression inside a
      // Project — the crash class the distinct handling closed
      case ag: AggregateExpression
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        failed = true; ag
      case a: AttributeReference if !newIds.contains(a.exprId) =>
        resolve(a) match {
          case r: AttributeReference if r.name == "user_id" => uidR
          case r: AttributeReference if r.name == "event_type" => etypeR
          case SlotExpr(_, _) => slot2
          // a pulled-out grouping alias over DIM columns resolves to
          // an expression whose references live in the (reused) dim
          // subtree — already part of child2's output, pass through
          case other if other.references.nonEmpty &&
              other.references.forall(x => newIds.contains(x.exprId)) => other
          case _ => failed = true; a
        }
    }
    val newOutputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(convert(a), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(convert(al.child), al.name)(exprId = al.exprId)
      case other => failed = true; other
    }
    if (failed) return None
    // nothing from the old subtree may survive the conversion
    if (newOutputs.exists(_.references.exists(a => !newIds.contains(a.exprId))))
      return None

    if (exact) Some(Project(newOutputs, child2))
    else {
      // original key order, each rebased: base keys onto the cascade,
      // dim keys verbatim (their subtree rode along)
      val groupings2 = resolvedGroupings.flatMap {
        case a: AttributeReference if a.name == "user_id" => Some(uidR)
        case a: AttributeReference if a.name == "event_type" => Some(etypeR)
        case SlotExpr(ts, _) if isTs(ts) => Some(slot2)
        case e if e.references.nonEmpty &&
            e.references.subsetOf(dimOutputIds) => Some(e)
        case _ => None
      }.distinct
      Some(Aggregate(groupings2, newOutputs, child2))
    }
  }

  /** Quantile-cascade substitution (VERDICT r7 next #2): an ad-hoc
    * EXACT nearest-rank quantile over the store's base table —
    *
    *   base.groupBy(series keys?, slot(S)?)
    *       .agg(percentile_disc(q) WITHIN GROUP (ORDER BY cents))
    *
    * — served from the `quant_T` bottom-k column family when the read
    * is PROVABLY exact. percentile_disc is the SQL-standard nearest
    * rank (the smallest value with cumulative fraction ≥ q = element
    * ceil(q·n) of the sorted multiset — the same convention
    * [[TsdbStore.fetchQuantile]] reads off the sketch), and below
    * K=512 samples per evaluated cell the stored buffer holds EVERY
    * sample, so the sketch read equals the raw computation value-for-
    * value (cents are integers; stored as exact doubles).
    *
    * The exactness gate runs at OPTIMIZE time against the monoid
    * cascade's per-cell counts: one bounded, dt-pruned aggregate over
    * `agg_T` rows (never raw) computes the max sample count over the
    * query's own evaluated cells, and at ≥ K the rule DECLINES — an
    * estimate must never masquerade as the exact answer the query
    * text wrote. That is the substitution's one optimize-time job;
    * it reads ≤ |series|·(range/T) cascade rows, the same data the
    * substituted plan would scan anyway.
    *
    * Scope: grouping any subset of {user_id, event_type, slot(S)}
    * with a materialized level T dividing S; series-identity filters
    * transfer; ts_us bounds must be T-ALIGNED (no split path — a raw
    * boundary piece cannot join a sketch merge without re-sketching,
    * which is the raw plan anyway); every aggregate output must be a
    * quantile over cents — percentile_disc (ascending, modern
    * calculation) or, round 9, percentile_cont / native percentile()
    * (both resolve to [[Percentile]] before the optimizer runs, and a
    * sub-K buffer holds the cell's FULL multiset, so the interpolated
    * read is exact too; [[contRead]] mirrors PercentileBase's
    * interpolation arithmetic bit-for-bit). Mixed disc+cont requests
    * share one scan; mixed monoid+quantile aggregates would need a
    * two-table join and block instead. Exact-grain hits (T == S, full
    * grain) read the per-slot buffer DIRECTLY — a pure Project over
    * quant_T, zero shuffle; coarser grains semilattice-merge the
    * buffers with one re-aggregation.
    *
    * Round 9 also composes the ENRICHED shape: a series-key-preserving
    * unique INNER dim join under the aggregate (the p95-per-metadata-
    * attribute dashboard) unwraps like the value path's, the sub-K
    * gate then sums n per DIM GROUP (a dim group unions cells, so the
    * whole group must fit one buffer for the merged read to be exact),
    * and the substituted read joins quant_T to the untouched dim
    * subtree and semilattice-merges per (dim keys, slot). Dim grouping
    * keys must be plain attributes, and the rewrite declines when dim
    * output names would shadow the sketch read's columns. */
  private def tryRewriteQuantile(agg: Aggregate): Option[LogicalPlan] = {
    // cheap reject before any unwrap work: the path only exists for
    // quantile aggregates (percentile_disc, or cont's resolved form)
    val hasPdisc = agg.aggregateExpressions.exists(_.exists {
      case AggregateExpression(_: PercentileDisc, _, _, _, _) => true
      case AggregateExpression(_: Percentile, _, _, _, _) => true
      case _ => false
    })
    if (!hasPdisc) return None
    // round 9: the quantile path unwraps a series-key-preserving
    // unique dim join too — the enriched percentile dashboard (p95
    // per metadata attribute) merges sketches BY dim group instead of
    // rescanning raw
    val (rel, cond, exprMap, dimJoin) = unwrapMaybeJoin(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    val store = storeRootOf(rel) match {
      case Some(s) => s
      case None => return None
    }
    def resolve(e: Expression): Expression = e.transform {
      case a: AttributeReference if exprMap.contains(a.exprId) => exprMap(a.exprId)
    }
    val identityIds = rel.output
      .filter(a => a.name == "user_id" || a.name == "event_type")
      .map(_.exprId).toSet
    val tsUsId = rel.output.find(_.name == "ts_us").map(_.exprId)
    val centsId = rel.output.find(_.name == "cents").map(_.exprId)
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => tsUsId.contains(a.exprId)
      case _ => false
    }
    var seriesCond: Option[Expression] = None
    var lowerUs = Seq.empty[Long]
    var upperUs = Seq.empty[Long]
    cond.toSeq.flatMap(splitConjuncts).foreach {
      case c if c.references.nonEmpty &&
          c.references.forall(a => identityIds.contains(a.exprId)) =>
        seriesCond = Some(seriesCond.map(And(_, c)).getOrElse(c))
      case GreaterThanOrEqual(t, Literal(l: Long, LongType)) if isTs(t) =>
        lowerUs :+= l
      case LessThanOrEqual(Literal(l: Long, LongType), t) if isTs(t) =>
        lowerUs :+= l
      case LessThan(t, Literal(u: Long, LongType)) if isTs(t) =>
        upperUs :+= u
      case GreaterThan(Literal(u: Long, LongType), t) if isTs(t) =>
        upperUs :+= u
      case _ => return None
    }
    if (lowerUs.exists(_ < 0L) || upperUs.exists(_ < 0L)) return None
    var stepSec = 0L
    var hasUid = false; var hasEtype = false
    var baseKeys = 0
    // dim-side grouping keys pass through the rewrite verbatim — but
    // only plain ATTRIBUTES (a snapshot column): an arbitrary dim
    // expression would need an exprId mapping through the regrouping,
    // which the leaf-by-leaf convert below does not build
    val dimOutputIds: AttributeSet =
      dimJoin.map(_.dim.outputSet).getOrElse(AttributeSet.empty)
    var dimKeys = Seq.empty[AttributeReference]
    var ok = true
    agg.groupingExpressions.map(resolve).foreach {
      case a: AttributeReference if a.name == "user_id" &&
          identityIds.contains(a.exprId) => hasUid = true; baseKeys += 1
      case a: AttributeReference if a.name == "event_type" &&
          identityIds.contains(a.exprId) => hasEtype = true; baseKeys += 1
      case SlotExpr(ts, s) if isTs(ts) =>
        if (stepSec != 0L && stepSec != s) ok = false
        else { stepSec = s; baseKeys += 1 }
      case a: AttributeReference if dimOutputIds.contains(a) =>
        if (!dimKeys.exists(_.exprId == a.exprId)) dimKeys :+= a
      case _ => ok = false
    }
    if (!ok || baseKeys > 3) return None

    val info = storeInfo(store) match {
      case Some(x) => x
      case None => return None
    }
    if (!baseScanIsLive(info, store, rel)) return None
    val layout = info.layout
    if (!layout.quantiles) return None
    // coarsest level dividing the slot step (slotless merges any
    // level) whose step every bound aligns to, with BOTH families
    // materialized — quant_T serves the read, agg_T proves exactness
    val t = layout.steps
      .filter(s => stepSec % s == 0)
      .sorted.reverse
      .find { s =>
        val su = s * 1000000L
        (lowerUs ++ upperUs).forall(_ % su == 0L) &&
          tableExistsCached(info, store, s"quant_$s") &&
          tableExistsCached(info, store, s"agg_$s")
      } match {
      case Some(x) => x
      case None => return None
    }
    if (!sizeGateOk(info, rel, store, s"quant_$t")) return None

    // collect the distinct requested quantiles — nearest-rank
    // (percentile_disc) and interpolated (percentile_cont / native
    // percentile(), both resolved to Percentile by the time the
    // optimizer runs) are each serveable from the stored sample, since
    // a sub-K cell's bottom-k buffer IS the cell's full value multiset;
    // any other aggregate blocks the rewrite
    var qs = Seq.empty[(Double, Boolean)] // (quantile, isCont)
    var bad = false
    agg.aggregateExpressions.foreach(_.foreach {
      case AggregateExpression(pd: PercentileDisc, Complete, false, None, _)
          if !pd.reverse && !pd.legacyCalculation &&
            pd.percentageExpression.foldable =>
        (resolve(pd.child), pd.percentageExpression.eval()) match {
          case (a: AttributeReference, q: java.lang.Double)
              if centsId.contains(a.exprId) && q > 0.0 && q <= 1.0 =>
            if (!qs.contains((q.doubleValue, false))) qs :+= ((q.doubleValue, false))
          case _ => bad = true
        }
      case AggregateExpression(pc: Percentile, Complete, false, None, _)
          if !pc.reverse && pc.percentageExpression.foldable &&
            pc.frequencyExpression.foldable &&
            pc.frequencyExpression.eval() == 1L =>
        (resolve(pc.child), pc.percentageExpression.eval()) match {
          case (a: AttributeReference, q: java.lang.Double)
              if centsId.contains(a.exprId) && q >= 0.0 && q <= 1.0 =>
            if (!qs.contains((q.doubleValue, true))) qs :+= ((q.doubleValue, true))
          case _ => bad = true
        }
      case _: AggregateExpression => bad = true
      case _ => ()
    })
    if (bad || qs.isEmpty) return None
    // dim-join guards (round 9): the dim side must be join-key-unique
    // (shared multiplicity gate), its output must not shadow the quant
    // table's own column names (the sketch read below binds pri /
    // value / slot_ts / n by NAME), and dim grouping keys must not
    // collide with the base key names the post-merge projection
    // selects — any of these simply declines the rewrite
    dimJoin.foreach { dj =>
      if (!dimIsUnique(info, dj)) return None
      val reserved = Set("slot_ts", "pri", "value", "n", "sk", "dt")
      if (dj.dim.output.exists(a => reserved.contains(a.name))) return None
      // the generated read/gate aliases are __graft_-prefixed so a
      // plausible dim column (q_0, cnt, …) can't shadow them; a dim
      // column actually named __graft_* declines rather than risking
      // the name-bound repAtt/gate lookups picking the wrong side
      if (dj.dim.output.exists(_.name.startsWith("__graft_"))) return None
      val baseNames = Set("user_id", "event_type", "slot_ts")
      if (dimKeys.exists(a => baseNames.contains(a.name))) return None
      if (dimKeys.map(_.name).distinct.size != dimKeys.size) return None
    }

    import org.apache.spark.sql.{functions => F, Column}
    import org.apache.spark.sql.graftshim.ColumnBridge
    // rebase an identity-only condition onto another table BY NAME
    // (sound: identityIds proved each reference is the relation's own
    // user_id / event_type attribute)
    def seriesCol: Option[Column] = seriesCond.map(c =>
      ColumnBridge.column(c.transform {
        case a: AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
      }))
    val loSec = lowerUs.maxOption.map(_ / 1000000L)
    val hiSec = upperUs.minOption.map(_ / 1000000L)
    def dtPruned(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def dtCol(sec: Long): Column = {
        val day = java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))
        if (layout.monthly) F.lit(f"${day.getYear}%04d-${day.getMonthValue}%02d")
        else F.lit(java.sql.Date.valueOf(day))
      }
      var d = df
      seriesCol.foreach(c => d = d.filter(c))
      loSec.foreach(l => d = d.filter(F.col("slot_ts") >= l)
        .filter(F.col("dt") >= dtCol(l)))
      hiSec.foreach(h => d = d.filter(F.col("slot_ts") < h)
        .filter(F.col("dt") <= dtCol(h - 1L)))
      d
    }
    // attach the (unique-proven) dim subtree to a pruned cascade/quant
    // scan — built at the LOGICAL level so the join condition binds by
    // exprId (a metadata sidecar legitimately carries its own user_id
    // column; name-based resolution would be ambiguous) and the
    // original join hint survives. Returns the joined frame plus an
    // exprId-backed column lookup for the scan side's identity keys.
    def withDim(df: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, String => Column) = {
      val plan = df.queryExecution.analyzed
      def att(n: String): Attribute = plan.output.find(_.name == n).get
      dimJoin match {
        case None => (df, (n: String) => F.col(n))
        case Some(dj) =>
          val cond2 = dj.pairs.map { case (name, d) =>
            EqualTo(att(name), d): Expression }.reduce(And)
          val joined = org.apache.spark.sql.graftshim.DatasetBridge
            .ofRows(session, Join(plan, dj.dim, Inner, Some(cond2), dj.node.hint))
          (joined, (n: String) => ColumnBridge.column(att(n)))
      }
    }
    val dimKeyCols: Seq[Column] = dimKeys.map(a => ColumnBridge.column(a))

    // group keys of the EVALUATED cells, shared by the gate query and
    // the substituted read (both run over T-level cascade tables);
    // identity keys resolve through the exprId-backed lookup so a
    // dim-side user_id cannot capture them
    def cellKeys(c: String => Column): Seq[Column] =
      (if (hasUid) Seq(c("user_id")) else Nil) ++
      (if (hasEtype) Seq(c("event_type")) else Nil) ++
      (if (stepSec == 0L) Nil
       else if (stepSec == t) Seq(F.col("slot_ts"))
       else Seq((F.expr(s"slot_ts div $stepSec") * stepSec).as("slot_ts")))

    // ---- the exactness gate: max raw samples per evaluated GROUP ----
    // with a dim join the evaluated groups are keyed by the dim
    // attributes — each (unique-join) dim group is a UNION of cells,
    // so the gate joins the same dim subtree and sums n per group: the
    // merged sample must hold every sample of the whole group
    val (gateBase, gateC) = withDim(dtPruned(tableScan(info, store, s"agg_$t")))
    // One gate job over (base, column-resolver): max over evaluated
    // groups of the summed cell counts.
    def maxCountJob(base: org.apache.spark.sql.DataFrame,
                    c: String => Column): Long = {
      val gateKeys = cellKeys(c) ++ dimKeyCols
      val counts =
        if (gateKeys.isEmpty) base.agg(F.sum("n").as("__graft_cnt"))
        else base.groupBy(gateKeys: _*).agg(F.sum("n").as("__graft_cnt"))
      val r = counts.agg(F.max("__graft_cnt")).collect()
      if (r.isEmpty || r.head.isNullAt(0)) 0L else r.head.getLong(0)
    }
    // Cache design (review r11, twice-revised): the count is MONOTONE
    // in the filters — dropping the range/series predicates can only
    // add rows to a group or add groups, so an UNFILTERED max is an
    // upper bound for every filtered variant at the same grain. A
    // sliding-window dashboard (new lo/hi every refresh) therefore
    // hits ONE permanent "global" cache entry whenever the grain is
    // sub-K and some unfiltered query at the grain has run; otherwise
    // each distinct range caches its own PRUNED count — on any miss
    // the cost is exactly the round-10 pruned job, never an unpruned
    // full-cascade scan. Keys carry every remaining input: cascade
    // level, evaluated grain, the dim subtree's content fingerprint,
    // and (rng only) the range/series text by NAME (exprIds are fresh
    // per query). agg_$t's own content is covered by the store stamp
    // cachedGate validates against; an unfingerprintable dim runs the
    // job uncached.
    val seriesSig = seriesCond.map(_.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
    }.toString).getOrElse("none")
    val dimSig: Option[String] = dimJoin match {
      case None => Some("nodim")
      case Some(dj) => planSignature(dj.dim).map { sig =>
        val keyPos = dj.pairs
          .map(p => dj.dim.output.indexWhere(_.exprId == p._2.exprId))
        val grpPos = dimKeys
          .map(a => dj.dim.output.indexWhere(_.exprId == a.exprId))
        s"$sig|jk=${dj.pairs.map(_._1).mkString(",")}:${keyPos.mkString(",")}" +
          s"|gk=${grpPos.mkString(",")}"
      }
    }
    def gateKey(scope: String): Option[String] =
      dimSig.map(d => s"maxN|$scope|t=$t|step=$stepSec|uid=$hasUid|et=$hasEtype|$d")
    val unfiltered = loSec.isEmpty && hiSec.isEmpty && seriesCond.isEmpty
    val canCache = info.dataStamp.nonEmpty && dimSig.nonEmpty
    val maxN: Long =
      if (unfiltered)
        // the query itself is global: its count IS the monotone bound,
        // cached under the range-free key every filtered variant reads
        cachedGate(info, gateKey("global"))(maxCountJob(gateBase, gateC))
      else if (canCache) {
        // filtered query: consult an ALREADY-CACHED global bound (a
        // cache miss never triggers the unpruned full-cascade job here —
        // on a miss the cost must stay the round-10 pruned job, or a
        // churning stamp under streaming ingest would make every
        // optimize strictly more expensive than before the cache
        // existed). The global entry is populated only when an
        // unfiltered query at this grain actually runs.
        val bound = info.gates.get(gateKey("global").get)
          .collect { case b: Long => b }
        val approxOn = session.conf
          .get("spark.graft.rollup.quantile.approx", "false").toBoolean
        bound match {
          case Some(b) if b < graft.functions.BottomKSample.K => b
          // over-K bound: the exact per-range count only matters when
          // it could still DECLINE — with approx on it never does
          case Some(b) if approxOn => b
          case _ => cachedGate(info,
            gateKey(s"rng|lo=$loSec|hi=$hiSec|series=$seriesSig"))(
            maxCountJob(gateBase, gateC))
        }
      } else maxCountJob(gateBase, gateC)
    // Above K samples per evaluated group the stored buffer is a
    // UNIFORM K-SAMPLE of the group, not its full multiset — by
    // default the rule declines (an estimate must never masquerade as
    // the exact answer the query text wrote). The opt-in approx flag
    // (VERDICT r9 missing #1) serves the sketch estimate anyway —
    // O(1/√K) rank error — which is where the rewrite pays MOST: at
    // production poll density the ad-hoc percentile otherwise always
    // re-sorts raw. Default off preserves the exactness contract.
    if (maxN >= graft.functions.BottomKSample.K &&
      !session.conf.get("spark.graft.rollup.quantile.approx", "false").toBoolean)
      return None

    // ---- the substituted read over quant_T ----
    // a dim join always takes the merge path: its groups union cells
    // across series, so even the exact grain re-aggregates (one
    // ObjectHashAggregate over dim-grouped sketch rows)
    val exact = t == stepSec && hasUid && hasEtype && dimJoin.isEmpty
    def rankRead(valueCol: Column, q: Double): Column = {
      val n = F.size(valueCol)
      // groups only exist where sketches do; the one empty-buffer case
      // is the GLOBAL aggregate over an empty range, where raw
      // percentile_disc is NULL too (the guard also keeps ANSI
      // element_at in range)
      F.when(n > 0,
        F.element_at(F.array_sort(valueCol),
          F.greatest(F.lit(1L), F.ceil(F.lit(q) * n)).cast("int")))
    }
    // interpolated read, mirroring PercentileBase.getPercentile EXACTLY
    // so the rewritten answer is bit-identical to evaluating the text
    // over raw: position = q·(n-1); equal bracket keys short-circuit
    // (Spark returns the key, not the arithmetic identity, which can
    // differ in the last ulp); otherwise
    // (higher−position)·v[lower] + (position−lower)·v[higher]
    def contRead(valueCol: Column, q: Double): Column = {
      val n = F.size(valueCol)
      val sorted = F.array_sort(valueCol)
      val pos = F.lit(q) * (n - 1).cast("double")
      val lower = F.floor(pos)
      val higher = F.ceil(pos)
      val vLo = F.element_at(sorted, (lower + 1).cast("int")).cast("double")
      val vHi = F.element_at(sorted, (higher + 1).cast("int")).cast("double")
      F.when(n > 0,
        F.when(lower === higher || vLo === vHi, vLo)
          .otherwise((higher.cast("double") - pos) * vLo
            + (pos - lower.cast("double")) * vHi))
    }
    def read(valueCol: Column, q: (Double, Boolean)): Column =
      if (q._2) contRead(valueCol, q._1) else rankRead(valueCol, q._1)
    val qName: Map[(Double, Boolean), String] =
      qs.zipWithIndex.map { case (q, i) => q -> s"__graft_q_$i" }.toMap
    val (rep0, repC) = withDim(dtPruned(tableScan(info, store, s"quant_$t")))
    val rep =
      if (exact)
        rep0.select(F.col("user_id") +: F.col("event_type") +:
          F.col("slot_ts") +:
          qs.map(q => read(F.col("value"), q).as(qName(q))): _*)
      else {
        val ms = F.udaf(new graft.functions.BottomKMergeState)
        val keys = cellKeys(repC) ++ dimKeyCols
        val merged =
          if (keys.isEmpty)
            rep0.agg(ms(F.col("pri"), F.col("value")).as("sk"))
          else rep0.groupBy(keys: _*)
            .agg(ms(F.col("pri"), F.col("value")).as("sk"))
        merged.select(
          ((if (hasUid) Seq(F.col("user_id")) else Nil) ++
           (if (hasEtype) Seq(F.col("event_type")) else Nil) ++
           (if (stepSec != 0L) Seq(F.col("slot_ts")) else Nil) ++
           dimKeyCols ++
           qs.map(q => read(F.col("sk.value"), q).as(qName(q)))): _*)
      }
    val repPlan = rep.queryExecution.analyzed
    def repAtt(name: String): AttributeReference =
      repPlan.output.find(_.name == name).get match {
        case a: AttributeReference => a
      }

    // convert each original output: percentile_disc leaves become the
    // rep frame's q_i columns, grouping references its key columns —
    // arbitrary derived outputs (pdisc arithmetic folded into the
    // Aggregate's output list) survive leaf-by-leaf, like the value
    // rule's convert
    val newIds = repPlan.output.map(_.exprId).toSet
    var failed = false
    def convert(e: Expression): Expression = e.transform {
      case ag @ AggregateExpression(pd: PercentileDisc, Complete, false, None, _)
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        pd.percentageExpression.eval() match {
          case q: java.lang.Double if qName.contains((q.doubleValue, false)) =>
            repAtt(qName((q.doubleValue, false)))
          case _ => failed = true; ag
        }
      case ag @ AggregateExpression(pc: Percentile, Complete, false, None, _)
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        pc.percentageExpression.eval() match {
          case q: java.lang.Double if qName.contains((q.doubleValue, true)) =>
            repAtt(qName((q.doubleValue, true)))
          case _ => failed = true; ag
        }
      case ag: AggregateExpression
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        failed = true; ag
      case a: AttributeReference if !newIds.contains(a.exprId) =>
        resolve(a) match {
          case r: AttributeReference if r.name == "user_id" => repAtt("user_id")
          case r: AttributeReference if r.name == "event_type" => repAtt("event_type")
          case SlotExpr(_, _) => repAtt("slot_ts")
          case _ => failed = true; a
        }
    }
    val newOutputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(convert(a), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(convert(al.child), al.name)(exprId = al.exprId)
      case other => failed = true; other
    }
    if (failed) return None
    if (newOutputs.exists(_.references.exists(a => !newIds.contains(a.exprId))))
      return None
    Some(Project(newOutputs, repPlan))
  }

  /** Unwrap Projects and Filters between an Aggregate and a Window —
    * the delta-aggregate twin of [[unwrap]]: returns the window node,
    * the combined (projection-resolved) filter condition found ABOVE
    * the window, and the exprId→expression map of the projections.
    * References in the returned expressions may be window outputs (the
    * lag columns) or deeper columns. */
  private def unwrapToWindow(p: LogicalPlan)
      : Option[(Window, Option[Expression], Map[ExprId, Expression])] =
    p match {
      case w: Window => Some((w, None, Map.empty))
      case Project(projList, child) =>
        unwrapToWindow(child).flatMap { case (w, c0, m0) =>
          def resolve(e: Expression): Expression = e.transform {
            case a: AttributeReference if m0.contains(a.exprId) => m0(a.exprId)
          }
          val entries = projList.map {
            case a: AttributeReference => Some(a.exprId -> resolve(a))
            case al: Alias => Some(al.exprId -> resolve(al.child))
            case _ => None
          }
          if (entries.contains(None)) None
          else Some((w, c0, entries.flatten.toMap))
        }
      case Filter(cond, child) =>
        unwrapToWindow(child).map { case (w, c0, m) =>
          val rc = cond.transform {
            case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
          }
          (w, Some(c0.map(And(_, rc)).getOrElse(rc)), m)
        }
      case _ => None
    }

  /** Rate-cascade substitution (VERDICT r6 next #6): the wrap-corrected,
    * heartbeat-validated counter-delta aggregate
    *
    *   base → lag(cents), lag(ts_us) over (series, ORDER ts_us, event_id)
    *        → filter(prev_ts_us IS NOT NULL ∧ ts_us − prev_ts_us ≤ hb·10⁶)
    *        → groupBy(series keys?, slot(S))
    *        → agg(count(1), sum(wrap-delta), sum(ts_us − prev_ts_us))
    *
    * is the SAME computation the store materializes as `rate_T`
    * ([[TsdbStore]] validDeltas → rateAggFromDeltas), so it substitutes
    * the way the monoid four substitute `agg_T`: exact-step hits
    * collapse to a Project over the rate cascade, coarser steps re-sum
    * (each cascade row is already a per-cell sum of deltas — summing
    * sums is the monoid composition). The match is deliberately exact:
    * the heartbeat literal must equal the store's STAMPED heartbeatSec
    * (a different heartbeat is a different validity rule), the delta
    * must be the engine's canonical ((c−p) % cap + cap) % cap with
    * cap = WrapCap (or the native wrap_delta), the window exactly
    * lag(1) over (user_id, event_type) ordered (ts_us, event_id) asc —
    * any deviation leaves the plan alone. Series filters transfer from
    * either side of the window; T-aligned ts_us bounds transfer from
    * ABOVE it only (a time filter BELOW the window changes which sample
    * is "previous" — that is not the cascade's content). */
  private def tryRewriteRate(agg: Aggregate): Option[LogicalPlan] = {
    val (win, condAbove, exprMap) = unwrapToWindow(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    // below the window: column pruning + pushed-down series filters
    val (rel, condBelow, mBelow) = unwrap(win.child) match {
      case Some(x) => x
      case None => return None
    }
    val store = storeRootOf(rel) match {
      case Some(s) => s
      case None => return None
    }
    val info = storeInfo(store) match {
      case Some(x) => x
      case None => return None
    }
    if (!baseScanIsLive(info, store, rel)) return None
    val layout = info.layout
    def relId(name: String): Option[ExprId] =
      rel.output.find(_.name == name).map(_.exprId)
    val (uidId, etypeId, tsId, evId, centsId) =
      (relId("user_id"), relId("event_type"), relId("ts_us"),
        relId("event_id"), relId("cents")) match {
        case (Some(a), Some(b), Some(c), Some(d), Some(e)) => (a, b, c, d, e)
        case _ => return None
      }
    def resolveBelow(e: Expression): Expression = e.transform {
      case a: AttributeReference if mBelow.contains(a.exprId) => mBelow(a.exprId)
    }
    def isRel(e: Expression, id: ExprId): Boolean = resolveBelow(e) match {
      case a: AttributeReference => a.exprId == id
      case _ => false
    }

    // the window must be EXACTLY the canonical delta window — series
    // partition, (ts_us, event_id) ascending order, two lag(1) columns
    // over cents and ts_us
    if (win.partitionSpec.map(resolveBelow).collect {
        case a: AttributeReference => a.exprId
      }.toSet != Set(uidId, etypeId)) return None
    win.orderSpec.map(o => (resolveBelow(o.child), o.direction)) match {
      case Seq((t: AttributeReference, Ascending), (ev: AttributeReference, Ascending))
          if t.exprId == tsId && ev.exprId == evId => ()
      case _ => return None
    }
    if (win.windowExpressions.length != 2) return None
    var prevCentsId: Option[ExprId] = None
    var prevTsId: Option[ExprId] = None
    win.windowExpressions.foreach {
      case al @ Alias(WindowExpression(
          Lag(in, Literal(1, IntegerType), Literal(null, _), false), _), _) =>
        if (isRel(in, centsId)) prevCentsId = Some(al.exprId)
        else if (isRel(in, tsId)) prevTsId = Some(al.exprId)
      case _ => ()
    }
    val (pcId, ptId) = (prevCentsId, prevTsId) match {
      case (Some(a), Some(b)) => (a, b)
      case _ => return None
    }
    def isAtt(e: Expression, id: ExprId): Boolean = e match {
      case a: AttributeReference => a.exprId == id
      case _ => false
    }

    // the engine's canonical wrap-corrected delta and elapsed time
    val cap = graft.Tables.WrapCap
    def isDelta(e: Expression): Boolean = e match {
      case Remainder(Add(Remainder(Subtract(c, p, _), Literal(c1: Long, LongType), _),
          Literal(c2: Long, LongType), _), Literal(c3: Long, LongType), _)
          if c1 == cap && c2 == cap && c3 == cap &&
            isRel(c, centsId) && isAtt(p, pcId) => true
      case graft.functions.WrapDelta(p, c, Literal(c1: Long, LongType))
          if c1 == cap && isAtt(p, pcId) && isRel(c, centsId) => true
      case _ => false
    }
    def isDt(e: Expression): Boolean = e match {
      case Subtract(t, p, _) if isRel(t, tsId) && isAtt(p, ptId) => true
      case _ => false
    }

    // filter classification. ABOVE the window: the heartbeat gate
    // (REQUIRED, must equal the stamped heartbeat) and
    // isnotnull(prev_ts_us) (REQUIRED) — together the cascade's
    // validity rule; inferred isnotnull(ts_us) is implied by the
    // heartbeat conjunct in both engines and may be dropped; identity
    // conjuncts and T-aligned ts_us bounds transfer. BELOW the window:
    // identity conjuncts ONLY.
    val identityIds = Set(uidId, etypeId)
    var hbOk = false; var prevNotNull = false
    var seriesCond: Option[Expression] = None
    var lowerUs = Seq.empty[Long]; var upperUs = Seq.empty[Long]
    def addSeries(c: Expression): Unit =
      seriesCond = Some(seriesCond.map(And(_, c)).getOrElse(c))
    var badConjunct = false
    condAbove.toSeq.flatMap(splitConjuncts).foreach {
      case c if c.references.nonEmpty &&
          c.references.forall(a => identityIds.contains(a.exprId)) =>
        addSeries(c)
      case LessThanOrEqual(d, Literal(hb: Long, LongType))
          if isDt(d) && hb == layout.heartbeatSec * 1000000L => hbOk = true
      case IsNotNull(a: AttributeReference) if a.exprId == ptId =>
        prevNotNull = true
      case IsNotNull(e) if isRel(e, tsId) => () // implied by the heartbeat gate
      case GreaterThanOrEqual(t, Literal(l: Long, LongType)) if isRel(t, tsId) =>
        lowerUs :+= l
      case LessThanOrEqual(Literal(l: Long, LongType), t) if isRel(t, tsId) =>
        lowerUs :+= l
      case LessThan(t, Literal(u: Long, LongType)) if isRel(t, tsId) =>
        upperUs :+= u
      case GreaterThan(Literal(u: Long, LongType), t) if isRel(t, tsId) =>
        upperUs :+= u
      case _ => badConjunct = true
    }
    condBelow.toSeq.flatMap(splitConjuncts).foreach {
      case c if c.references.nonEmpty &&
          c.references.forall(a => identityIds.contains(a.exprId)) =>
        addSeries(c)
      case _ => badConjunct = true
    }
    if (badConjunct || !hbOk || !prevNotNull) return None

    // grouping: ANY subset of {series keys, slot(S)}, like the value
    // path — dropping a key re-sums more cascade rows, and dropping
    // the slot entirely is the per-series (or global) RANGE TOTAL of
    // transferred counters, "bytes moved in the last N days"
    def resolve(e: Expression): Expression = e.transform {
      case a: AttributeReference if exprMap.contains(a.exprId) => exprMap(a.exprId)
    }
    var stepSec = 0L
    var hasUid = false; var hasEtype = false
    var ok = agg.groupingExpressions.length <= 3
    agg.groupingExpressions.map(e => resolveBelow(resolve(e))).foreach {
      case a: AttributeReference if a.exprId == uidId => hasUid = true
      case a: AttributeReference if a.exprId == etypeId => hasEtype = true
      case SlotExpr(ts, s) if ts.exprId == tsId =>
        if (stepSec != 0L && stepSec != s) ok = false else stepSec = s
      case _ => ok = false
    }
    if (!ok) return None
    // coarsest level dividing the slot step (a slotless aggregate
    // re-sums any level) WHOSE step the ts bounds align to — bounds
    // aligned only at a finer level transfer there instead of blocking
    // (the rate path never splits: a raw boundary piece would need the
    // window re-run, and the window's input cannot be range-pruned)
    val t = layout.steps
      .filter(s => stepSec % s == 0)
      .sorted.reverse
      .find { s =>
        val su = s * 1000000L
        (lowerUs ++ upperUs).forall(_ % su == 0L) &&
          tableExistsCached(info, store, s"rate_$s")
      } match {
      case Some(x) => x
      case None => return None
    }
    if (!sizeGateOk(info, rel, store, s"rate_$t")) return None

    val cascade = tableScan(info, store, s"rate_$t").queryExecution.analyzed
    def att(name: String): AttributeReference =
      cascade.output.find(_.name == name).get match { case a: AttributeReference => a }
    val (uid, etype, slot) = (att("user_id"), att("event_type"), att("slot_ts"))
    val (nvC, dC, dtC) = (att("n_valid"), att("delta_cents"), att("dt_us"))
    val rebasedSeries: Seq[Expression] = seriesCond.toSeq.map(_.transform {
      case a: AttributeReference => att(a.name)
    })
    val slotBounds: Seq[Expression] =
      lowerUs.map(l => GreaterThanOrEqual(slot, Literal(l / 1000000L, LongType))) ++
      upperUs.map(u => LessThan(slot, Literal(u / 1000000L, LongType)))
    def dtLit(sec: Long): Expression = {
      val day = java.time.LocalDate.ofEpochDay(Math.floorDiv(sec, 86400L))
      if (layout.monthly)
        Literal.create(f"${day.getYear}%04d-${day.getMonthValue}%02d",
          org.apache.spark.sql.types.StringType)
      else Literal(day.toEpochDay.toInt, org.apache.spark.sql.types.DateType)
    }
    val dtBounds: Seq[Expression] =
      cascade.output.collect { case a: AttributeReference if a.name == "dt" => a }
        .headOption.toSeq.flatMap { dt =>
          // same last-included-second derivation as the value rule's
          // dt twin: an exclusive bound on a day boundary must not
          // keep the boundary partition (ADVICE r7 #2)
          lowerUs.map(l => GreaterThanOrEqual(dt, dtLit(l / 1000000L))) ++
          upperUs.map(u => LessThanOrEqual(dt, dtLit((u - 1L) / 1000000L)))
        }
    val child2: LogicalPlan =
      (rebasedSeries ++ slotBounds ++ dtBounds).reduceOption(And) match {
        case Some(c) => Filter(c, cascade)
        case None => cascade
      }

    val exact = t == stepSec && hasUid && hasEtype
    def ae(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)
    val slot2: Expression =
      if (t == stepSec || stepSec == 0L) slot // slotless never reads slot2
      else Multiply(IntegralDivide(slot, Literal(stepSec, LongType)),
        Literal(stepSec, LongType))
    // the global empty-grouping total over an empty input: count(1)=0
    // but sum(n_valid)=NULL — coalesce like the value rule's global form
    val global = !hasUid && !hasEtype && stepSec == 0L
    val countRepl: Expression = KnownNotNull(
      if (exact) nvC
      else if (global) Coalesce(Seq(ae(Sum(nvC)), Literal(0L, LongType)))
      else ae(Sum(nvC)))
    val deltaRepl: Expression = if (exact) dC else ae(Sum(dC))
    val dtRepl: Expression = if (exact) dtC else ae(Sum(dtC))

    val newIds = cascade.output.map(_.exprId).toSet
    var failed = false
    def convert(e: Expression): Expression = e.transform {
      case ag @ AggregateExpression(f, Complete, false, None, _)
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        f match {
          case Count(Seq(Literal(v, _))) if v != null => countRepl
          case Sum(c, _) =>
            val rc = resolveBelow(resolve(c))
            if (isDelta(rc)) deltaRepl
            else if (isDt(rc)) dtRepl
            else { failed = true; ag }
          case _ => failed = true; ag
        }
      // the rate cascade's rows are per-(series, slot) DELTA sums — no
      // distinct set (or FILTER-clause semantics) survives them; block
      // every unhandled aggregate shape before the attribute fallback
      // can bury a half-converted AggregateExpression in the output
      case ag: AggregateExpression
          if ag.references.forall(a => !newIds.contains(a.exprId)) =>
        failed = true; ag
      case a: AttributeReference if !newIds.contains(a.exprId) =>
        resolveBelow(resolve(a)) match {
          case r: AttributeReference if r.exprId == uidId => uid
          case r: AttributeReference if r.exprId == etypeId => etype
          case SlotExpr(ts, _) if ts.exprId == tsId => slot2
          case _ => failed = true; a
        }
    }
    val newOutputs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(convert(a), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(convert(al.child), al.name)(exprId = al.exprId)
      case other => failed = true; other
    }
    if (failed) return None
    if (newOutputs.exists(_.references.exists(a => !newIds.contains(a.exprId))))
      return None

    if (exact) Some(Project(newOutputs, child2))
    else {
      val groupings2 =
        (if (hasUid) Seq(uid) else Nil) ++
        (if (hasEtype) Seq(etype) else Nil) ++
        (if (stepSec != 0L) Seq(slot2) else Nil)
      Some(Aggregate(groupings2, newOutputs, child2))
    }
  }
}
