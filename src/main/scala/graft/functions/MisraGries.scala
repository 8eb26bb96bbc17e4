package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary (k counters) — the mergeable
  * heavy-hitters sketch: which tokens/domains/users dominate a 100 TB
  * corpus, without a full count-and-sort. Completes the sketch family
  * next to [[Hll]] (distinct), [[Bloom]] (membership) and
  * [[TopKByValue]] (exact order stats on a known key).
  *
  * Guarantee (pinned in MisraGriesSpec): for every item x with true
  * frequency f(x), the summary's estimate m(x) satisfies
  * `f(x) - n/(k+1) <= m(x) <= f(x)`; any item with f(x) > n/(k+1) is
  * guaranteed present. Merge (Agarwal et al., "Mergeable Summaries"):
  * sum counters pairwise, then subtract the (k+1)-th largest count and
  * drop non-positive counters — the error bound is preserved under
  * arbitrary merge trees, which is what makes the sketch safe under
  * Spark's partial aggregation. Counter VALUES may differ by merge
  * order (only the bound is canonical), so this is a spec-pinned
  * component, not an oracled query.
  */
case class MgSummary(words: Array[String], counts: Array[Long]) {
  def estimate(w: String): Long = {
    val i = words.indexOf(w)
    if (i < 0) 0L else counts(i)
  }
}

class MisraGries(k: Int) extends Aggregator[String, MgSummary, MgSummary] {
  require(k >= 1, "MisraGries needs at least one counter")

  override def zero: MgSummary = MgSummary(Array.empty, Array.empty)

  override def reduce(b: MgSummary, w: String): MgSummary = {
    val i = b.words.indexOf(w)
    if (i >= 0) { b.counts(i) += 1; b }
    else if (b.words.length < k)
      MgSummary(b.words :+ w, b.counts :+ 1L)
    else {
      // decrement-all: every counter pays one, zeros fall out
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
      val keep = b.counts.indices.filter(b.counts(_) > 0).toArray
      MgSummary(keep.map(b.words), keep.map(b.counts))
    }
  }

  override def merge(a: MgSummary, b: MgSummary): MgSummary = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a.words.length) { m(a.words(i)) = a.counts(i); i += 1 }
    i = 0
    while (i < b.words.length) {
      m(b.words(i)) = m.getOrElse(b.words(i), 0L) + b.counts(i); i += 1
    }
    if (m.size <= k) MgSummary(m.keys.toArray, m.values.toArray)
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val kept = m.iterator.map { case (w, c) => (w, c - cut) }
        .filter(_._2 > 0L).toArray
      MgSummary(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(r: MgSummary): MgSummary = r
  override def bufferEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}
