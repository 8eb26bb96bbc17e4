package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Near-dup detection without an oracle: plant near-duplicates and
  * require the banded candidate generators to recover them while
  * keeping unrelated docs apart (SURVEY.md §5.2). */
class DedupSpec extends SparkSpec {

  /** 40 mutually-dissimilar base docs (disjoint-ish vocab draws from a
    * 10k-word space) + two planted near-dups (1–2 word edits ⇒
    * shingle-Jaccard ≳ 0.9). */
  private def plantedDocs = {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i + 1)
      val words = (0 until 60).map(_ => s"w${rnd.nextInt(10000)}")
      (i.toLong, words.mkString(" "))
    }
    val nearDup = Seq(
      (100L, base(0)._2.split(" ").updated(30, "zzz").mkString(" ")),
      (101L, base(1)._2.split(" ").updated(10, "zzz").updated(45, "yyy").mkString(" ")))
    (base ++ nearDup).toDF("doc_id", "text")
  }

  test("minhash LSH recovers planted near-dups, excludes unrelated docs") {
    val cand = DedupOps.minHashCandidates(plantedDocs, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 100L)), "planted near-dup (0,100) missed")
    assert(cand.contains((1L, 101L)), "planted near-dup (1,101) missed")
    // unrelated docs share no band bucket except by rare hash collision
    assert(cand.size <= 4, s"candidate set too dense: $cand")
  }

  test("minhash candidates contain every pair with Jaccard >= 0.9") {
    // at 4 bands x 4 rows the miss probability at s=0.9 is
    // (1 - 0.9^4)^4 ≈ 1.5% per pair — and the planted pairs sit above
    // 0.9, where xxhash64 is fixed, so the outcome is deterministic
    val docs = plantedDocs
    val sh = TextOps.shingles(docs, 3)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("a_id", "sh"); val b = sh.toDF("b_id", "sh")
    val exact = a.join(b, a("sh") === b("sh") && col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
      .join(sz.toDF("a_id", "na"), "a_id").join(sz.toDF("b_id", "nb"), "b_id")
      .filter(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture lost its planted near-dups")
    val cand = DedupOps.minHashCandidates(docs, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(cand),
      s"missed high-Jaccard pairs: ${exact.diff(cand)}")
  }

  test("simhash: one-word edit stays within small hamming distance") {
    val sigs = DedupOps.simHashSignatures(plantedDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(100L)) <= 16, "near-dup simhash too far")
    assert(ham(sigs(1L), sigs(101L)) <= 16, "near-dup simhash too far")
    val far = ham(sigs(5L), sigs(23L))
    assert(far > 16, s"unrelated docs implausibly close: $far")
    // (0,100) is at distance 6 < 8 chunks ⇒ pigeonhole GUARANTEES a
    // shared 8-bit chunk regardless of which bits flipped
    val cand = DedupOps.simHashCandidates(plantedDocs, maxDist = 16, chunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 100L)))
  }

  test("connected components: chains merge transitively, singletons stay") {
    import spark.implicits._
    // component {1,2,3,9} via chain, {5,6} pair, {7} singleton
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L))
      .toDF("a_id", "b_id")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 7L, 9L).toDF("node")
    val got = DedupOps.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L), s"got $got")
  }

  test("gridded jaccard join equals the plain join row for row") {
    // the hot-shingle grid must be result-invisible: same pair
    // multiset, same intersection counts, same rounded jaccard
    val docs = Tables.documents(spark, Sf)
    val plain = graft.operators.TextOps.jaccardPairs(docs, 3, 0.02)
      .collect().map(_.toSeq).toSet
    val grid = graft.operators.TextOps.jaccardPairs(docs, 3, 0.02, forceGrid = true)
      .collect().map(_.toSeq).toSet
    assert(plain == grid, "grid path diverges from plain join")
    assert(plain.nonEmpty)
  }

  test("connected components: empty node set converges to empty, no NPE") {
    import spark.implicits._
    // sum-over-empty is NULL — the convergence check must treat it as
    // the (trivially reached) fixpoint, the empty-corpus case every
    // composed pipeline (e.g. semanticDedup) can legitimately hit
    val out = DedupOps.connectedComponents(
      Seq.empty[Long].toDF("node"),
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
    assert(out.count() == 0)
  }

  test("connected components: driver fast path equals the label loop") {
    import spark.implicits._
    // round 17: bounded edge sets resolve by driver union-find; the
    // min-label fixpoint is unique, so fast path and loop must agree
    // label for label — on a planted mix of chains, a star, singletons,
    // and a cycle
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (10L, 12L),
      (10L, 13L), (20L, 21L), (21L, 22L)) ++
      (30L until 40L).map(i => (i, i + 1))).toDF("a_id", "b_id")
    val nodes = ((1L to 3L) ++ (10L to 13L) ++ (20L to 22L) ++
      (30L to 40L) ++ Seq(99L)).toDF("node")
    val fast = DedupOps.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = DedupOps.connectedComponents(nodes, edges, driverEdgeCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == loop, s"fast $fast != loop $loop")
    assert(fast(99L) == 99L && fast(3L) == 1L && fast(13L) == 10L)
  }

  test("connected components: long path converges within iteration cap") {
    import spark.implicits._
    // a 12-node path: worst case for label propagation depth
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val nodes = (0L to 11L).toDF("node")
    val got = DedupOps.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L), s"got $got")
  }

  test("connected components: diameter past maxIters throws, never lies") {
    import spark.implicits._
    // two 50-node paths — diameter 49 needs ~50 label-propagation
    // rounds; at maxIters=10 the old code would silently return
    // half-propagated labels (VERDICT r3 #6) — the contract is to throw
    val edges = ((0L until 49L).map(i => (i, i + 1)) ++
      (100L until 149L).map(i => (i, i + 1))).toDF("a_id", "b_id")
    val nodes = ((0L to 49L) ++ (100L to 149L)).toDF("node")
    val e = intercept[IllegalStateException] {
      // driverEdgeCap = 0 forces the distributed loop: this test pins
      // the LOOP's convergence contract (the round-17 driver fast path
      // would resolve this bounded graph without iterating at all)
      DedupOps.connectedComponents(nodes, edges, maxIters = 10, driverEdgeCap = 0)
    }
    assert(e.getMessage.contains("did not converge"))
    // with the cap raised — and RELIABLE checkpointing, the 1000-executor
    // option where executor-local blocks don't survive failures — the
    // same graph resolves to its two min labels. Under a multi-JVM
    // master the op (correctly) REFUSES to invent a checkpoint dir —
    // pin that guard, then satisfy it: local-cluster workers share
    // this host's filesystem, so an explicit temp dir IS
    // cluster-visible here (a real deployment would point this at
    // HDFS/S3)
    if (!spark.sparkContext.isLocal &&
        spark.sparkContext.getCheckpointDir.isEmpty) {
      val guard = intercept[IllegalArgumentException] {
        DedupOps.connectedComponents(nodes, edges, maxIters = 60,
          reliableCheckpoint = true, driverEdgeCap = 0)
      }
      assert(guard.getMessage.contains("cluster-visible"))
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt-spec").toString)
    }
    val got = DedupOps.connectedComponents(nodes, edges, maxIters = 60,
      reliableCheckpoint = true, driverEdgeCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L, 100L), s"got ${got.values.toSet}")
    assert((0L to 49L).forall(got(_) == 0L) && (100L to 149L).forall(got(_) == 100L))
  }
}
