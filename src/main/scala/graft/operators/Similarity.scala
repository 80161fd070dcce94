package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.4 E3).
  *
  * [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  * set against a full scan of candidates — no shuffle until the final
  * per-query top-k. [[lshTopK]] is the scale path: sign-random-projection
  * buckets turn the cross product into an equi-join on bucket id.
  */
object Similarity {

  /** Exact top-k by cosine. `queries` and `candidates` are frames with
    * (vec_id, embedding). The query side is broadcast — at 100 TB the
    * candidate scan parallelizes over input splits and the only shuffle is
    * the per-query top-k (tiny: |queries|·k rows after partial sort). */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = candidates.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // fused codegen'd kernel (graft.functions.CosineSim): one pass per pair,
    // no intermediate array — bit-identical to the composable VectorOps form
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.CosineSim.cosine_sim(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  /** Fixed seeded hyperplanes for sign-random-projection bucketing. */
  private[operators] def hyperplanes(nbits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Packed sign bits of `nbits` random projections — the SRP bucket id.
    * Each projection is one fused codegen'd [[graft.functions.DotProduct]]
    * (the HOF `aggregate(zip_with(...))` form is CodegenFallback:
    * interpreted per element, an intermediate array per hyperplane). */
  private[operators] def srpBucket(v: org.apache.spark.sql.Column,
                                   nbits: Int, dim: Int, seed: Long = 42L)
      : org.apache.spark.sql.Column =
    hyperplanes(nbits, dim, seed).zipWithIndex.map { case (hp, i) =>
      when(graft.functions.DotProduct.dot_product(v, typedlit(hp)) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: bucket = packed sign bits of `nbits` random
    * projections; candidates join queries on bucket equality only. Recall
    * trades off with nbits; the join is a plain shuffle equi-join that
    * survives any scale. Output: qid, cid, cos, rnk within bucket. */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int,
              nbits: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      srpBucket(col("embedding"), nbits, dim).as("bucket"))
    val c = candidates.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      srpBucket(col("embedding"), nbits, dim).as("bucket"))
    val scored = c.join(q, "bucket")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.CosineSim.cosine_sim(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }
}
