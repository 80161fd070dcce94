package graft.plans

import graft.{Engine, SparkTestBase}
import graft.functions.{CosineSim, VectorOps}
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkTestBase {

  test("ReplaceCosineHof rewrites composable cosine into the fused kernel") {
    spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
    try {
      val emb = Engine.Tables(spark, Sf0001).embeddings.limit(100)
      val df = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
        .crossJoin(broadcast(emb.select(col("vec_id").as("b"), col("embedding").as("vb"))))
        .select(col("a"), col("b"), VectorOps.cosine(col("va"), col("vb")).as("c"))
      val optimized = df.queryExecution.optimizedPlan
      val fused = optimized.collect { case n =>
        n.expressions.flatMap(_.collect { case e: CosineSim => e }) }.flatten
      assert(fused.nonEmpty, s"rule did not fire:\n${optimized.treeString.take(1500)}")

      // results identical to the un-rewritten plan
      spark.experimental.extraOptimizations = Nil
      val want = df.orderBy("a", "b").collect().toSeq
      spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
      val got = df.orderBy("a", "b").collect().toSeq
      assert(got == want)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule leaves non-cosine aggregate/zip_with patterns untouched") {
    spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
    try {
      val emb = Engine.Tables(spark, Sf0001).embeddings.limit(5)
      // dot without the norm product: must NOT be rewritten
      val df = emb.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
      val fused = df.queryExecution.optimizedPlan.collect { case n =>
        n.expressions.flatMap(_.collect { case e: CosineSim => e }) }.flatten
      assert(fused.isEmpty)
      assert(df.count() == 5)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
