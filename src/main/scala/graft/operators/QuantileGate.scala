package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantile gating at scale (SURVEY.md §2.4 extension): keep the rows
  * whose metric is at or below the corpus's q-quantile — the adaptive form
  * of a quality cutoff ("drop the most-repetitive decile"), where the
  * threshold follows the data instead of being hand-tuned.
  *
  * Neither classic form survives both the 100 TB test and the oracle test:
  * a global `row_number` rank is a single-task sort, and interpolated
  * `percentile`/`quantile_cont` differ across engines in final ulps
  * (boundary rows flip). Instead: aggregate the metric into a VALUE
  * HISTOGRAM — after 4-decimal rounding its cardinality is bounded (≤ ~10⁴
  * distinct values) regardless of corpus size — cumulate counts over that
  * tiny frame, pick the smallest value whose cumulative count reaches
  * ⌈q·n⌉, and broadcast the one-row threshold back. Every step is a plain
  * hash aggregate or a window over the bounded histogram; comparisons are
  * exact (the rounded doubles are bit-identical in any engine), so the
  * gate is deterministic and oracle-checkable.
  *
  * Ties at the threshold are kept (the gate admits ≥ q of the corpus),
  * matching SQL's `<=` mirror exactly.
  */
object QuantileGate {

  /** Rows of `df` with non-null `metricCol` <= the exact q-quantile
    * threshold. Null metrics are excluded from the population entirely
    * (they could never be emitted — `null <= thr` filters them — and
    * engines disagree on where nulls cumulate in a window, so counting
    * them would shift the rank differently per engine). `metricCol` should
    * be bounded-cardinality (e.g. r4-rounded); the histogram window is
    * sized by distinct metric values, not rows. */
  def atOrBelow(df: DataFrame, metricCol: String, q: Double): DataFrame = {
    require(q > 0 && q < 1, s"quantile must be in (0,1), got $q")
    val m = col(metricCol)
    // the frame feeds two branches (histogram + probe); materialize it ONCE
    // with localCheckpoint, which is three fixes in one: (a) the metric
    // derivation doesn't run per branch, (b) the null filter lands on a
    // LogicalRDD there is nothing to push into — a filter below the caller's
    // projections would be predicate-pushed through them, re-evaluating the
    // whole interpreted-HOF metric per row (measured 2.9s -> 19s on qe17),
    // and (c) unlike persist() (whose CacheManager entry outlives the query
    // forever), checkpoint blocks are freed by the ContextCleaner once the
    // frame is unreachable — no session-lifetime storage leak.
    val src = df.localCheckpoint().filter(m.isNotNull)
    val hist = src.groupBy(m.as("__v")).agg(count("*").as("__c"))
    val wCum = Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ceil in DECIMAL, not double: 0.07*100 is 7.000000000000001 in binary,
    // whose ceil (8) disagrees with the exact rank 7 the oracle computes
    val cutoff = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(col("__cum") >= ceil(
        lit(BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP)) * col("__n")))
      .agg(min(col("__v")).as("__thr"))
    src.join(broadcast(cutoff), m <= col("__thr")).drop("__thr")
  }

  /** Per-group exact quantile gate: each `groupCol` value gets its own
    * q-quantile threshold — per-domain quality cutoffs, so a noisy domain
    * is trimmed against its own distribution, not the global one. Same
    * bounded-histogram construction keyed by group; the per-group one-row
    * thresholds broadcast back onto the corpus. */
  def atOrBelowPerGroup(df: DataFrame, groupCol: String, metricCol: String,
                        q: Double): DataFrame = {
    require(q > 0 && q < 1, s"quantile must be in (0,1), got $q")
    val m = col(metricCol)
    val src = df.localCheckpoint().filter(m.isNotNull)
    val hist = src.groupBy(col(groupCol), m.as("__v")).agg(count("*").as("__c"))
    val wCum = Window.partitionBy(groupCol).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cutoff = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(col("__cum") >= ceil(
        lit(BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP)) * col("__n")))
      .groupBy(groupCol).agg(min(col("__v")).as("__thr"))
    src.join(broadcast(cutoff), Seq(groupCol))
      .filter(m <= col("__thr")).drop("__thr")
  }
}
