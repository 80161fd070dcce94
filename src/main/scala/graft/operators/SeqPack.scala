package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-budget bins
  * (concat-then-chunk). Each document is assigned to the bin in which its
  * first token lands: `bin = (cumulative_tokens_before_doc) div budget`.
  *
  * All-integer math over a window cumulative sum — deterministic, oracle-
  * exact, and one sort-shuffle at scale. For 100 TB the single global
  * window becomes per-shard packing: partition by a shard key first
  * (`repartitionByRange`) and pack within shards — bins never span
  * executors and the plan stays one local sort per shard.
  */
object SeqPack {

  /** Adds `bin` (long) to each row. */
  def pack(df: DataFrame, idCol: String, tokCol: String, budget: Long): DataFrame = {
    val w = Window.orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("bin", expr(s"__cum div $budget"))
      .drop("__cum")
  }

  /** Per-bin stats: docs and token load per bin. */
  def binStats(df: DataFrame, idCol: String, tokCol: String, budget: Long): DataFrame =
    pack(df, idCol, tokCol, budget)
      .groupBy("bin")
      .agg(count("*").as("n_docs"), sum(col(tokCol)).as("tok"))
}
