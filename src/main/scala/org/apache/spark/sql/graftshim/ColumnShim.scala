package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion `private[sql]`
  * (`classic.ExpressionUtils`); this package-located shim re-exposes the two
  * conversions a library needs to ship custom Catalyst expressions as
  * `Column` functions. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `QueryExecutionErrors` is `private[sql]`; re-exposed so custom
    * expressions can raise the exact error ANSI `Divide` raises (same error
    * class, SQLSTATE, and query-context formatting). */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)
}
