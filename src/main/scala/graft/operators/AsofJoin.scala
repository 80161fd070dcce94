package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row with
  * `rightTs <= leftTs` per key. Spark has no native operator; rather than a
  * range-join explosion (left ⋈ right on key + inequality, then max per
  * left row — quadratic per key), this is the scalable composition:
  * tag-union both sides, one shuffle per key, a running `last(right)` over
  * event order, keep left rows. Cost is sort-shuffle of |L|+|R| — the same
  * shape Catalyst plans for a window function, and it survives 100 TB
  * because no per-key cross product ever materializes.
  *
  * Right rows sort before left rows at equal timestamps, so equality
  * matches (ASOF `>=` semantics, same as DuckDB's ASOF JOIN oracle).
  */
object AsofJoin {

  /** Left as-of-join right. Output: all left columns + right columns as a
    * nullable struct `asof` (null when no prior right row exists).
    *
    * `rightTieCols`: when the right side can hold several rows at the SAME
    * (key, ts), name columns that order them — the as-of pick is then the
    * LAST row in that order. Without it, equal-timestamp right rows are
    * picked in shuffle-dependent (nondeterministic) order. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightTieCols: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val keyCols = keys.map(col)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
      struct(left.columns.map(col): _*).as("__l") :+
      lit(null).cast(rType).as("__r"): _*)
    val r = right.select(keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
      lit(null).cast(lType).as("__l") :+
      struct(right.columns.map(col): _*).as("__r"): _*)
    // tie columns read through the __r struct: null for left rows, which
    // cannot reorder relative to right rows (side already separates them)
    val order = col("__ts") +: col("__side") +: rightTieCols.map(c => col("__r").getField(c))
    val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__asof").as("asof")): _*)
  }
}
