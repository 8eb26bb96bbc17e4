package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale (SURVEY.md §2 J): MinHash-LSH and
  * SimHash. Both are banded so candidate generation is an EQUI-join on
  * (band, bucket) — the only formulation that survives 100 TB: the
  * all-pairs comparison space never materializes, only hash-bucket
  * collisions do. Hash functions are Spark's xxhash64 (deterministic,
  * codegen'd) — no oracle parity is possible (DuckDB hashes differ),
  * so correctness is ScalaTest: planted near-dups must be recovered.
  */
object DedupOps {

  /** k min-hashes per doc over its shingle set: h_i = min over shingles
    * of xxhash64(i, shingle). One shuffle (groupBy doc_id); the k mins
    * fold map-side. */
  def minHashSignatures(shingles: DataFrame, k: Int): DataFrame =
    shingles.groupBy("doc_id")
      .agg(min(xxhash64(lit(0), col("sh"))).as("h0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i")): _*)

  /** LSH banding: k signatures split into `bands` bands of k/bands rows;
    * band bucket = hash of its rows. Docs sharing any band bucket are
    * candidate pairs (Jaccard ≳ (1/bands)^(bands/k) threshold curve). */
  def minHashCandidates(docs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sig = minHashSignatures(TextOps.shingles(docs, 3), k)
    val banded = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"h$i"))
      sig.select(col("doc_id"), lit(b).as("band"),
        xxhash64(cols: _*).as("bucket"))
    }.reduce(_ unionByName _)
    val a = banded.toDF("a_id", "band", "bucket")
    val b = banded.toDF("b_id", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** 64-bit SimHash over the token bag: bit j of the signature is the
    * sign of Σ_tokens (±1 depending on bit j of xxhash64(token)).
    * Computed as 64 conditional sums in ONE aggregation pass. */
  def simHashSignatures(docs: DataFrame): DataFrame = {
    val tok = TextOps.tokens(docs).withColumn("h", xxhash64(col("word")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val sig = (0 until 64).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, banded
    * into four 16-bit chunks: distance ≤ 3 ⇒ some chunk is equal
    * (pigeonhole), so candidates come from an equi-join, then the
    * exact popcount filter runs only on collisions. */
  def simHashCandidates(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sig = simHashSignatures(docs)
    val banded = (0 until 4).map { c =>
      sig.select(col("doc_id"), col("simhash"), lit(c).as("chunk"),
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
    }.reduce(_ unionByName _)
    val a = banded.toDF("a_id", "a_sig", "chunk", "key")
    val b = banded.toDF("b_id", "b_sig", "chunk", "key")
    a.join(b, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
