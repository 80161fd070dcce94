package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group z-score normalization and outlier gating over an INTEGRAL
  * metric column — the robust-scaling step before comparing or mixing
  * quality signals across sources (each domain's length/score distribution
  * is its own baseline; a global threshold would gate by domain identity).
  *
  * Determinism at any partitioning: a double-accumulated mean/variance is
  * partition-order-dependent (the [[EmbedQuality]] lesson), so the fit
  * aggregates EXACT sums — Σx and Σx² as decimal(38,0) (associative,
  * overflow-safe far past 100 TB of long metrics; DuckDB's HUGEINT sum is
  * the oracle twin) — and converts to doubles ONCE in a fixed expression
  * sequence: μ = Σx/n, σ = sqrt(max(0, (Σx² − (Σx)²/n)/n)). The max(0,·)
  * clamps the catastrophic-cancellation negative for constant groups, so
  * σ = 0 and z defines to 0.0 instead of NaN.
  *
  * Scale shape: fit is one map-side-combined hash shuffle (one row per
  * group); apply broadcasts the tiny stats frame — the corpus never
  * shuffles. The apply half is a stateless projection after a
  * stream-static broadcast join, so it runs unchanged on a stream against
  * frozen stats (replay == batch asserted in StreamingSpec).
  */
object ZScore {

  /** Per-group (n, sx, sxx) exact sums + derived (mu, sd). One row per
    * group — persist like a QuantileGate threshold and re-apply to later
    * corpora or streams. */
  def fitStats(df: DataFrame, groupCol: String, metricCol: String): DataFrame = {
    // the exact-sum trick needs an integral metric: casting a fractional
    // column to decimal(38,0) would silently truncate every value before
    // the sums — refuse loudly instead
    val dt = df.schema(metricCol).dataType
    require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(dt),
      s"zscore fitStats: $metricCol must be an integral type (exact sums), got $dt")
    val x = col(metricCol).cast(DecimalType(38, 0))
    // n must count METRIC values, not rows: sum() skips nulls, so a
    // count(*) n would divide real sums by a larger population and
    // fabricate mu/sd for any group with null metrics (e.g. off a left
    // join); null-metric rows contribute to neither fit nor gate output
    val st = df.groupBy(col(groupCol))
      .agg(count(col(metricCol)).as("n"), sum(x).as("__sx"), sum(x * x).as("__sxx"))
    val (n, sx, sxx) =
      (col("n").cast("double"), col("__sx").cast("double"), col("__sxx").cast("double"))
    st.select(col(groupCol), col("n"),
      (sx / n).as("mu"),
      sqrt(greatest(lit(0.0), (sxx - sx * sx / n) / n)).as("sd"))
  }

  /** z-score each row against FROZEN per-group stats and keep |z| ≤ zmax;
    * rows of groups absent from `stats` drop (no baseline — surface them
    * by fitting on the union instead). Output: input columns + z.
    * Zero-variance groups z-score to 0.0 (kept), not NaN. */
  def gateFrozen(df: DataFrame, stats: DataFrame, groupCol: String,
                 metricCol: String, zmax: Double): DataFrame = {
    require(zmax > 0, s"zscore gate: zmax must be > 0, got $zmax")
    // the output contract is "input columns + z" — a pre-existing z would
    // be silently overwritten by withColumn, so refuse loudly
    require(!df.columns.contains("z"),
      "zscore gateFrozen appends a z column; the input already has one — rename it first")
    // the stats columns join the corpus under collision-safe internal names:
    // an input frame that itself carries mu/sd (e.g. the output of another
    // fit) must not make the gate arithmetic ambiguous
    val st = stats.select(col(groupCol),
      col("mu").as("__zs_mu"), col("sd").as("__zs_sd"))
    val z = when(col("__zs_sd") === 0d, lit(0.0))
      .otherwise((col(metricCol).cast("double") - col("__zs_mu")) / col("__zs_sd"))
    df.join(broadcast(st), Seq(groupCol))
      .withColumn("z", z)
      .filter(abs(col("z")) <= zmax)
      // the equi-join hoists groupCol to position 0 — restore the caller's
      // column order so gate output is "input columns + z"
      .select(df.columns.map(col).toIndexedSeq :+ col("z"): _*)
  }

  /** Fit on the corpus, gate the same corpus — the batch self-audit form. */
  def gate(df: DataFrame, groupCol: String, metricCol: String,
           zmax: Double): DataFrame =
    gateFrozen(df, fitStats(df, groupCol, metricCol), groupCol, metricCol, zmax)
}
