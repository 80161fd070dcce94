package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-hash-checkable certificates for the APPROXIMATE operator family.
  *
  * The exact anchors (qe2, qe3, qe7, qe57) are DuckDB-oracled, but their
  * approximate scale twins were until now rows-only at the driver: their
  * recall/error claims lived solely in ScalaTest. Each certificate here
  * re-states such a claim as a DataFrame whose every column is either
  * (a) independently computable by the DuckDB oracle (exact counts,
  * exact pair lists) or (b) a literal-TRUE claim column the Spark side
  * genuinely computes — so a recall regression, a sketch miss, or a
  * frozen-path divergence hash-mismatches LOUDLY in CORRECTNESS instead
  * of hiding behind a rows-only check. This is the qe58c idiom
  * ([[Dedup.containmentAgreement]]) generalized to the ANN ladder, the
  * MinHash-LSH pair path, the embedding-dedup family, and the HLL
  * diversity card.
  *
  * Certificates are CERTIFICATION-TIER queries: they embed the exact
  * anchor (quadratic by design) beside the approximate form, so they
  * belong to the sf-small driver gate, never the 100 TB production path —
  * exactly like the anchors they certify, which SparkEntry.scaleTwins
  * already pairs with their production twins.
  */
object Certificates {

  /** Per-variant top-k recall rows: for each (variant, approx, floor),
    * emit (variant, n_exact, recall_ok) where n_exact counts the exact
    * top-k rows (oracle-computable from the qe3 exact SQL) and recall_ok
    * asserts |approx ∩ exact| / n_exact >= floor. The exact frame is
    * evaluated ONCE (caller checkpoints) and each approximate ladder rung
    * joins against it — recall here is the AGGREGATE across queries, the
    * same statistic SimilaritySpec's sweeps assert. */
  def topKRecall(exact: DataFrame,
                 variants: Seq[(String, DataFrame, Double)]): DataFrame = {
    require(variants.nonEmpty,
      "topKRecall: at least one variant is required (reduce over an empty " +
        "ladder would throw an opaque empty.reduceLeft)")
    variants.map { case (name, approx, floor) =>
      recallClaim(name, exact, approx, Seq("qid", "cid"),
        "n_exact", "recall_ok", floor)
    }.reduce(_ unionAll _)
  }

  /** Aggregate pair-recall claim row (variant, n_anchor, ok) over
    * (da, db) pair frames — the [[topKRecall]] idiom for near-dup PAIR
    * families. An empty exact side is vacuously ok (count is 0, never
    * null). */
  def pairRecall(variant: String, exactPairs: DataFrame,
                 approxPairs: DataFrame, floor: Double): DataFrame =
    recallClaim(variant, exactPairs, approxPairs, Seq("da", "db"),
      "n_anchor", "ok", floor)

  /** ONE recall-claim shape for both certificate families, parameterized
    * only by the join keys and output names — so the divisor guard, the
    * candidate dedup, and the empty-anchor convention are structurally
    * identical and cannot drift (the two previous copies had already
    * drifted on a null-sum coalesce). An empty anchor is vacuously ok
    * rather than an ANSI DIVIDE_BY_ZERO crash. */
  private def recallClaim(variant: String, anchor: DataFrame, approx: DataFrame,
                          keys: Seq[String], nName: String, okName: String,
                          floor: Double): DataFrame =
    anchor.select(keys.map(col): _*)
      .join(approx.select(keys.map(col): _*).distinct()
        .withColumn("__hit", lit(1)), keys, "left")
      .agg(count(lit(1)).as(nName),
        coalesce(sum(coalesce(col("__hit"), lit(0))), lit(0L)).as("__h"))
      .select(lit(variant).as("variant"), col(nName),
        when(col(nName) > 0,
          col("__h").cast("double") / col(nName) >= lit(floor))
          .otherwise(lit(true)).as(okName))

  /** Per-pair found certificate (the strongest form, usable when the
    * approximate path's recall is asserted TOTAL on real data — the
    * MinHash-LSH band construction finds every pair at j >= threshold
    * with the registered knobs, asserted since round 3 in DedupSpec):
    * every exact pair with its exact score and a `found` flag. The oracle
    * emits the exact pairs with literal TRUE, so ONE missed pair
    * hash-mismatches. */
  def pairsFound(exactPairs: DataFrame, candidatePairs: DataFrame,
                 scoreCol: String): DataFrame =
    exactPairs.join(
        candidatePairs.select(col("da"), col("db"))
          .distinct().withColumn("__f", lit(true)),
        Seq("da", "db"), "left")
      .select(col("da"), col("db"), col(scoreCol),
        coalesce(col("__f"), lit(false)).as("found"))

}
