package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** TimeSeriesOps.lttb — the sequential largest-triangle-three-buckets
  * chain as a streaming two-bucket per-series fold: pinned against a
  * naive whole-series reference implementation (same bucket semantics,
  * computed with everything in memory), across random multi-series
  * data, partition counts, and the edge shapes (single point, single
  * slot, anchor-slot remainder, two slots). */
class LttbSpec extends SparkSpec {

  private val Step = 600L
  private val StepUs = Step * 1000000L

  private type Pt = (Long, Long, Long) // (ts_us, event_id, cents)

  /** Naive reference: whole series in memory, same spec as the fold —
    * anchor = first point (its slot yields no second candidate), middle
    * slot i picks argmax triangle(prevChosen, p, centroid(slot i+1)),
    * last slot keeps the last point; single-slot series keep first+last. */
  private def reference(series: Seq[Pt]): Seq[(Long, Long, Long)] = {
    val sorted = series.sortBy(p => (p._1, p._2))
    val anchor = sorted.head
    def slotOf(ts: Long): Long = ts / StepUs
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    out += ((slotOf(anchor._1) * Step, anchor._1, anchor._3))
    val rest = sorted.tail.filter(p => slotOf(p._1) != slotOf(anchor._1))
    if (rest.isEmpty) {
      if (sorted.length > 1)
        out += ((slotOf(sorted.last._1) * Step, sorted.last._1, sorted.last._3))
      return out.toSeq
    }
    val slots = rest.groupBy(p => slotOf(p._1)).toSeq.sortBy(_._1)
    var prev = anchor
    for (i <- slots.indices) {
      val (sid, pts) = slots(i)
      if (i == slots.length - 1) {
        out += ((sid * Step, pts.last._1, pts.last._3))
      } else {
        val nxt = slots(i + 1)._2
        val cTs = nxt.map(_._1.toDouble).sum / nxt.length
        val cV = nxt.map(_._3.toDouble).sum / nxt.length
        var best: Pt = null
        var bestArea = -1.0
        pts.foreach { p =>
          val area = math.abs((p._1 - prev._1.toDouble) * (cV - prev._3) -
            (cTs - prev._1) * (p._3 - prev._3.toDouble))
          if (area > bestArea) { bestArea = area; best = p }
        }
        out += ((sid * Step, best._1, best._3))
        prev = best
      }
    }
    out.toSeq
  }

  private def runLttb(rows: Seq[(Long, String, Long, Long, Long)],
                      parts: Int): Map[(Long, String), Seq[(Long, Long, Long)]] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_type", "ts_us", "event_id", "cents")
      .repartition(parts)
    TimeSeriesOps.lttb(df, Step)
      .select(col("user_id"), col("event_type"), col("slot_ts"),
        col("ts_us"), round(col("value") * 100.0).cast("long").as("cents"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sortBy(x => (x._1, x._2)).toSeq }
  }

  test("random multi-series data matches the naive reference at any partitioning") {
    val rnd = new scala.util.Random(7)
    val base = 1704844800L * 1000000L
    val rows = for {
      uid <- 1L to 5L
      et <- Seq("click", "view")
      i <- 0 until 400
    } yield (uid, et,
      base + i * 97000000L + rnd.nextInt(1000000),
      uid * 10000L + i,
      (rnd.nextInt(10000) + 1).toLong)
    val expect = rows.groupBy(r => (r._1, r._2)).map { case (k, v) =>
      k -> reference(v.map(r => (r._3, r._4, r._5)))
        .sortBy(x => (x._1, x._2)).toSeq
    }
    for (parts <- Seq(1, 4, 32)) {
      val got = runLttb(rows, parts)
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, v) =>
        assert(v == expect(k), s"series $k differs at parts=$parts")
      }
    }
  }

  test("edge shapes: single point, anchor-slot-only, two slots") {
    val b = 1704844800L * 1000000L
    val rows = Seq(
      // single point
      (1L, "a", b + 10L, 1L, 500L),
      // several points all inside the anchor slot: first + last kept
      (2L, "a", b + 1000000L, 10L, 100L),
      (2L, "a", b + 2000000L, 11L, 900L),
      (2L, "a", b + 3000000L, 12L, 300L),
      // two slots: anchor + last point of the second slot
      (3L, "a", b + 1000000L, 20L, 100L),
      (3L, "a", b + StepUs + 1000000L, 21L, 700L),
      (3L, "a", b + StepUs + 2000000L, 22L, 400L))
    val got = runLttb(rows, 2)
    assert(got((1L, "a")) == Seq((1704844800L, b + 10L, 500L)))
    assert(got((2L, "a")) == Seq(
      (1704844800L, b + 1000000L, 100L),
      (1704844800L, b + 3000000L, 300L)))
    assert(got((3L, "a")) == Seq(
      (1704844800L, b + 1000000L, 100L),
      (1704844800L + Step, b + StepUs + 2000000L, 400L)))
  }

  test("the chain actually chains: a pick depends on the PREVIOUS pick") {
    // three slots; slot 2's candidates are equidistant from slot 3's
    // centroid in value, so the pick depends on where slot 1's pick
    // landed — LTOB (neighbor-local) would pick identically regardless
    val b = 1704844800L * 1000000L
    def rows(firstHigh: Boolean) = Seq(
      (1L, "a", b, 1L, if (firstHigh) 1000L else 0L), // anchor
      (1L, "a", b + StepUs, 2L, 500L),       // slot 1 single candidate? no:
      (1L, "a", b + StepUs + 1L, 3L, if (firstHigh) 0L else 1000L),
      (1L, "a", b + 2 * StepUs, 4L, 400L),   // slot 2 candidates
      (1L, "a", b + 2 * StepUs + 1L, 5L, 600L),
      (1L, "a", b + 3 * StepUs, 6L, 500L))   // last slot
    val g1 = runLttb(rows(firstHigh = true), 1)((1L, "a"))
    val g2 = runLttb(rows(firstHigh = false), 1)((1L, "a"))
    // the naive reference agrees on both inputs (the real assertion);
    // differing slot-2 picks across the two inputs show the chaining
    val e1 = reference(rows(firstHigh = true).map(r => (r._3, r._4, r._5)))
    val e2 = reference(rows(firstHigh = false).map(r => (r._3, r._4, r._5)))
    assert(g1 == e1.sortBy(x => (x._1, x._2)))
    assert(g2 == e2.sortBy(x => (x._1, x._2)))
  }
}
