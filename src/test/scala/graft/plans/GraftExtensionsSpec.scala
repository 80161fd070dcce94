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

  test("rule refuses (x,y) => x*x bait — not a dot product, must not rewrite") {
    spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
    try {
      import spark.implicits._
      val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
        .select((aggregate(zip_with(col("a"), col("b"), (x, _) => x * x),
          lit(0.0), (acc, x) => acc + x) /
          (sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x)) *
            sqrt(aggregate(col("b"), lit(0.0), (acc, x) => acc + x * x)))).as("c"))
      val fused = df.queryExecution.optimizedPlan.collect { case n =>
        n.expressions.flatMap(_.collect { case e: CosineSim => e }) }.flatten
      assert(fused.isEmpty, "x*x inside zip_with was miscompiled into a dot product")
      // sum(x*x over a) = 5; |a| = sqrt(5), |b| = 5 -> 5 / (5*sqrt(5))
      val v = df.head().getDouble(0)
      assert(math.abs(v - 5.0 / (math.sqrt(5.0) * 5.0)) < 1e-12,
        s"value corrupted by rewrite: $v")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite propagates ANSI divide-by-zero: a zero-norm vector throws in both forms") {
    // regression for the NumericEvalContext comparison bug (r11): the rule
    // compared the whole context to EvalMode.ANSI — always false — so the
    // rewritten kernel silently returned null where the HOF form's ANSI
    // Divide throws. The evalMode must be read out of the context.
    spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      def zeroNorm = Engine.Tables(spark, Sf0001).embeddings.limit(1)
        .select(transform(col("embedding"), _ => lit(0.0d)).as("a"),
          col("embedding").cast("array<double>").as("b"))
        .select(graft.functions.VectorOps.cosine(col("a"), col("b")).as("c"))
      val df = zeroNorm
      val fused = df.queryExecution.optimizedPlan.collect { case n =>
        n.expressions.flatMap(_.collect { case e: CosineSim => e }) }.flatten
      assert(fused.nonEmpty, "rewrite should fire on the zero-norm cosine form")
      assert(fused.forall(_.failOnError),
        "ANSI mode must propagate into the fused kernel's failOnError")
      val rewritten = intercept[Exception](df.collect())
      spark.experimental.extraOptimizations = Nil
      val hof = intercept[Exception](zeroNorm.collect())
      def code(e: Throwable): String =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5)
          .map(_.getMessage).mkString(" | ")
      assert(code(rewritten).contains("DIVIDE_BY_ZERO") &&
        code(hof).contains("DIVIDE_BY_ZERO"),
        s"expected both forms to raise DIVIDE_BY_ZERO:\n${code(rewritten)}\n${code(hof)}")
    } finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    }
  }

  test("rewrite preserves HOF null semantics: mismatched lengths stay null") {
    spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
    try {
      // parquet-backed (a LocalRelation would be constant-folded by
      // ConvertToLocalRelation before user-provided rules run)
      val df = Engine.Tables(spark, Sf0001).embeddings.limit(3)
        .select(col("embedding").as("a"), slice(col("embedding"), 1, 10).as("b"))
        .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      val fused = df.queryExecution.optimizedPlan.collect { case n =>
        n.expressions.flatMap(_.collect { case e: CosineSim => e }) }.flatten
      assert(fused.nonEmpty, "rewrite should fire on the plain cosine form")
      assert(df.head().isNullAt(0),
        "HOF cosine of mismatched arrays is null; the fused form must agree")
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

  test("rewrite over int arrays keeps the to-double cast (no type-unsound kernel)") {
    spark.experimental.extraOptimizations = Seq(ReplaceCosineHof)
    try {
      import spark.implicits._
      // ints cast to array<double> produce EXACTLY the matched pattern;
      // stripping the cast would hand CosineSim 4-byte elements it reads
      // as 8-byte doubles — garbage with no error
      val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("ia", "ib")
        .select(col("ia").cast("array<double>").as("a"),
          col("ib").cast("array<double>").as("b"))
        .select((aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) /
          (sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x)) *
            sqrt(aggregate(col("b"), lit(0.0), (acc, x) => acc + x * x)))).as("c"))
      val got = df.head().getDouble(0)
      val want = 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))
      assert(math.abs(got - want) < 1e-12,
        s"int-array cosine must stay numerically correct, got $got want $want")
    } finally spark.experimental.extraOptimizations = Nil
  }
}
