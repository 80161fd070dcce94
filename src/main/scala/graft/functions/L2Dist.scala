package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Fused Euclidean distance over two float/double array columns — the
  * codegen'd sibling of [[DotProduct]]/[[CosineSim]] for the IVF coarse
  * quantizer's hot loops ([[graft.operators.IvfIndex]] cell assignment and
  * centroid probing evaluate |rows|·nlist of these per pass; the HOF
  * `sqrt(aggregate(zip_with(...)))` form is CodegenFallback — interpreted
  * per element with an intermediate array per pair).
  *
  * Bit-parity with the HOF it replaces: the accumulation is the same
  * ascending-index `acc += (xi−yi)²` double sequence, finished by one
  * `sqrt` — identical values, so k-means cell assignments and probe
  * rankings cannot shift. Null semantics mirror the HOF composition: null
  * if either array is null, lengths differ, or any element is null.
  */
case class L2Dist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"l2_dist expects array<float|double>, got ${left.dataType} and ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def mayHaveNullElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (mayHaveNullElems(left) || mayHaveNullElems(right)) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def read(arr: String, t: DataType, i: String): String =
      if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (acc, n, i) = (ctx.freshName("acc"), ctx.freshName("n"), ctx.freshName("i"))
      val nullElemCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    double xi = ${read(a, lt, i)};
         |    double yi = ${read(b, rt, i)};
         |    double d = xi - yi;
         |    $acc += d * d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($acc); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Dist {
  /** Column-level entry point. */
  def l2_dist(a: Column, b: Column): Column =
    ColumnShim.column(L2Dist(ColumnShim.expression(a), ColumnShim.expression(b)))
}
