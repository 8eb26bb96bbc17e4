package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity building blocks (SURVEY.md §2 J, vector half).
  *
  * Determinism: every float is widened to double FIRST, products are
  * taken in index order, and the sum is a sequential left fold
  * (`aggregate`), matching DuckDB's `list_reduce` evaluation order
  * bit for bit. No BLAS, no reassociation.
  *
  * Scale: brute-force top-k is the correctness baseline (O(n²·d) —
  * fine to ~10⁴ vectors when one side is broadcast). The scale path is
  * [[lshBucketCosine]]: sign-random-projection buckets cut candidate
  * pairs to matching buckets only, trading recall for a ~bucket-count
  * speedup; both paths share the same scoring expression.
  */
object VectorOps {

  /** Cast a float array column to double. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double-array columns — the
    * native codegen [[graft.functions.DotProduct]] expression (same
    * index-order left fold as the `zip_with`+`aggregate` HOF and
    * DuckDB's `list_reduce`, ~6× faster on the all-pairs stage). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** vec_id + v (double) + nrm, from an embeddings table. */
  def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** All-pairs cosine with the small side broadcast; `cond` restricts
    * the pair space (a≠b for top-k, a<b for near-dup). */
  def cosinePairs(emb: DataFrame, cond: (Column, Column) => Column): DataFrame = {
    val n = normalized(emb)
    val a = n.toDF("a_id", "av", "anrm")
    val b = n.toDF("b_id", "bv", "bnrm")
    a.join(broadcast(b), cond(col("a_id"), col("b_id")))
      .withColumn("sim", round(dot(col("av"), col("bv")) / col("anrm") / col("bnrm"), 4))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a codegen-friendly integer hash mapped to [-0.5, 0.5). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(hash(lit(plane) * 1000003 + dim * 7919), lit(1000000)).cast("double")
      / lit(1000000.0)) - lit(0.5)

  /** Sign-random-projection (SimHash-style) bucket id over `nPlanes`
    * deterministic hyperplanes — the LSH prefilter for cosine ANN. */
  def srpBucket(v: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(1), size(v)), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** ANN via IVF (inverted-file) partitioning: k-means centroids
    * (spark.ml, fixed seed) assign each vector to its nearest cell;
    * each query probes its `nprobe` nearest cells, so scoring touches
    * ~nprobe/k of the corpus. The coarse quantizer is tiny (k
    * centroids, broadcast); the candidate join is an equi-join on
    * cell id — the IVF structure a vector store would persist. */
  def ivfCosine(emb: DataFrame, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val n = normalized(emb)
      .withColumn("fv", array_to_vector(col("v")))
    val km = new KMeans().setK(k).setSeed(42L).setFeaturesCol("fv")
    val model = km.fit(n)
    val cents = model.clusterCenters.map(_.toArray).zipWithIndex
    val spark = emb.sparkSession
    val centDf = spark.createDataFrame(
        cents.map { case (c, i) => (i, c) }.toSeq).toDF("cell", "cv")
    // nprobe nearest cells per vector by (exact) centroid distance
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d2").asc, col("cell").asc)
    val probed = n.drop("fv").crossJoin(broadcast(centDf))
      .withColumn("d2", dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("cv"))
        + dot(col("cv"), col("cv")))
      .withColumn("pr", row_number().over(w)).filter(col("pr") <= nprobe)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val a = probed.toDF("a_id", "av", "anrm", "cell")
    val b = probed.toDF("b_id", "bv", "bnrm", "cell")
    a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", round(dot(col("av"), col("bv")) / col("anrm") / col("bnrm"), 4))
      .select("a_id", "b_id", "cell", "sim").distinct()
  }

  /** ANN via LSH buckets: cosine scored only within matching buckets.
    * Recall < 1 by design; verified against brute force in ScalaTest. */
  def lshBucketCosine(emb: DataFrame, nPlanes: Int): DataFrame = {
    val n = normalized(emb).withColumn("bucket", srpBucket(col("v"), nPlanes))
    val a = n.toDF("a_id", "av", "anrm", "bucket")
    val b = n.toDF("b_id", "bv", "bnrm", "bucket")
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", round(dot(col("av"), col("bv")) / col("anrm") / col("bnrm"), 4))
      .select("a_id", "b_id", "bucket", "sim")
  }
}
