package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Native vec_dot expression: codegen and interpreted paths must agree
  * with the higher-order fold bit for bit (the oracle-parity property
  * that lets it replace the HOF in oracled queries). */
class DotProductSpec extends SparkSpec {

  test("vec_dot equals HOF zip_with+aggregate fold exactly") {
    val emb = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = emb.select(VectorOps.dot(col("v"), col("v")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diff == 0, "native dot diverges from HOF fold")
  }

  test("vec_dot registered as SQL function via extensions") {
    import spark.implicits._
    val r = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .selectExpr("vec_dot(a, b) AS d").as[Double].head()
    assert(r == 32.0)
  }

  test("null input yields null") {
    val r = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .collect().head
    assert(r.isNullAt(0))
  }
}
