package graft.functions

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._

/** The fused codegen'd kernel must be bit-identical to the composable
  * higher-order-function form (and hence to the DuckDB oracle). */
class CosineSimSpec extends SparkTestBase {

  test("fused cosine == composable cosine, bit-exact, on real embeddings") {
    val emb = Engine.Tables(spark, Sf0001).embeddings
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b")).limit(2000)
    val diff = pairs.select(
      CosineSim.cosine_sim(col("va"), col("vb")).as("fused"),
      VectorOps.cosine(col("va"), col("vb")).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diff.count() == 0, "fused kernel diverged from composable form")
  }

  test("SQL registration: cosine_sim usable from spark.sql") {
    CosineSim.register(spark)
    Engine.Tables(spark, Sf0001).embeddings.createOrReplaceTempView("emb_cs")
    val n = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_cs a JOIN emb_cs b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .head().getDouble(0)
    assert(n >= -1.0 && n <= 1.0)
  }

  test("null semantics mirror the HOF form: mismatch/zero-norm/null-element -> null") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)), // length mismatch
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))        // zero denominator
    ).toDF("a", "b")
    val out = df.select(CosineSim.cosine_sim(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), "mismatched lengths / zero norm must yield null")
    CosineSim.register(spark)
    val nullElem = spark.sql(
      "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS c")
    assert(nullElem.head().isNullAt(0), "null element must yield null")
    val nullArr = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D, 2.0D)) AS c")
    assert(nullArr.head().isNullAt(0), "null array must yield null")
  }

  test("fused dot product == composable dot, bit-exact; null on mismatch") {
    val emb = Engine.Tables(spark, Sf0001).embeddings.limit(200)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
    val diff = pairs.select(
      DotProduct.dot_product(col("va"), col("vb")).as("fused"),
      VectorOps.dot(col("va"), col("vb")).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diff.count() == 0, "fused dot diverged from composable form")
    import spark.implicits._
    val mm = Seq((Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(DotProduct.dot_product(col("a"), col("b"))).collect()
    assert(mm.forall(_.isNullAt(0)))
  }

  test("self-similarity is 1.0") {
    val one = Engine.Tables(spark, Sf0001).embeddings.limit(5)
      .select(CosineSim.cosine_sim(col("embedding"), col("embedding")).as("c"))
      .collect()
    assert(one.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6))
  }
}
