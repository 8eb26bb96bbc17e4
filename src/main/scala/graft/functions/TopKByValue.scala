package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (id, value) candidate for a bounded top-k. */
case class TopKEntry(id: Long, v: Double)

/** Bounded top-k by (value DESC, id ASC) as a typed Aggregator — the
  * map-side-combine formulation of top-k-per-group.
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(...))`)
  * must shuffle EVERY row to its group's partition before ranking; this
  * aggregator keeps at most k entries per group per partition, so at
  * 100 TB the shuffle carries k rows per (group × partition) instead of
  * the whole table — the same partial/final two-phase shape as sum().
  * Results are identical (proved by sharing q_topk_per_group's oracle);
  * the buffer is a sorted k-array, so merge is O(k) per combine. */
class TopKByValue(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {

  private def better(a: TopKEntry, b: TopKEntry): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  private def insert(buf: Seq[TopKEntry], e: TopKEntry): Seq[TopKEntry] = {
    if (buf.size >= k && !better(e, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, e))
      (front ++ (e +: back)).take(k)
    }
  }

  override def zero: Seq[TopKEntry] = Vector.empty
  override def reduce(buf: Seq[TopKEntry], e: TopKEntry): Seq[TopKEntry] =
    insert(buf, e)
  override def merge(x: Seq[TopKEntry], y: Seq[TopKEntry]): Seq[TopKEntry] =
    y.foldLeft(x)(insert)
  override def finish(r: Seq[TopKEntry]): Seq[TopKEntry] = r
  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
}
