package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded lifetime for the intra-query caches the candidate-generation
  * operators use (shingle sets, banded signatures, survivor pairs).
  *
  * Those operators persist a heavy shared intermediate, eagerly
  * materialize the (tiny) survivor relation against it, and unpersist
  * the intermediate before returning — but the survivor cache itself
  * must stay alive for the caller's consumption, whose end the operator
  * cannot observe. Left alone, a later query whose canonicalized plan
  * happens to match would silently reuse the previous query's cached
  * result — cross-query result reuse that misattributes bench cost and
  * is exactly the "result caching" the optimization rules forbid
  * crediting. So every DECLARED QUERY retires all previously returned
  * caches at construction (QueryDef wraps every builder): each query
  * pays its own full compute, caches only help within one query's
  * execution, and nothing survives the session.
  *
  * Thread safety: retire under a lock; a concurrent caller retiring
  * another thread's live cache merely forces a recompute (correctness
  * is unaffected — unpersisted cached plans recompute from lineage). */
object CacheScope {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Drop every cache returned by earlier operator calls. */
  def retire(): Unit = synchronized {
    live.foreach(df => scala.util.Try(df.unpersist(false)))
    live.clear()
  }

  /** Register a returned cache for retirement at the next operator call. */
  def keep(df: DataFrame): DataFrame = synchronized { live += df; df }
}
