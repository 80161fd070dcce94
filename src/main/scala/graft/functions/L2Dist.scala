package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnShim

/** Fused Euclidean distance over two float/double array columns — for the
  * IVF coarse quantizer's hot loops ([[graft.operators.IvfIndex]] cell
  * assignment and centroid probing evaluate |rows|·nlist of these per
  * pass; the HOF `sqrt(aggregate(zip_with(...)))` form is CodegenFallback).
  *
  * Bit-parity with the HOF it replaces: the same ascending-index
  * `acc += (xi−yi)²` double sequence, finished by one `sqrt` — identical
  * values, so k-means cell assignments and probe rankings cannot shift
  * (asserted against the HOF twin in CosineSimSpec).
  *
  * Loop scaffold, type checks, and null semantics live in
  * [[BinaryArrayFoldKernel]] (shared with [[DotProduct]]).
  */
case class L2Dist(left: Expression, right: Expression) extends BinaryArrayFoldKernel {
  override protected def fnName: String = "l2_dist"
  override protected def update(acc: Double, xi: Double, yi: Double): Double = {
    val d = xi - yi
    acc + d * d
  }
  override protected def finish(acc: Double): Double = math.sqrt(acc)
  override protected def updateCode(acc: String): String =
    s"double d = xi - yi; $acc += d * d;"
  override protected def finishCode(acc: String): String =
    s"java.lang.Math.sqrt($acc)"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Dist {
  /** Column-level entry point. */
  def l2_dist(a: Column, b: Column): Column =
    ColumnShim.column(L2Dist(ColumnShim.expression(a), ColumnShim.expression(b)))
}
