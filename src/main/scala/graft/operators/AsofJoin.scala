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
    * nullable struct `asof` (null when no prior right row exists). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
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
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__asof").as("asof")): _*)
  }
}
