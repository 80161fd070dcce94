package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared scaffold for fused binary array→double fold kernels
  * ([[DotProduct]], [[L2Dist]]): the type check, element reads with
  * float→double widening, null/length semantics, and the eval/codegen loop
  * live HERE once — subclasses supply only the per-element accumulation
  * and the finisher, so a fix to the shared semantics (e.g. the
  * containsNull scan or the break-on-null pattern) cannot drift between
  * kernels. [[CosineSim]] stays standalone: it folds three accumulators
  * with ANSI-divide finish semantics that don't fit this shape.
  *
  * Null semantics (all subclasses): null if either array is null, lengths
  * differ, or any element is null — mirroring the composable
  * `aggregate(zip_with(...))` HOF forms these kernels replace.
  */
abstract class BinaryArrayFoldKernel extends BinaryExpression {

  /** SQL-facing name used in type-check errors. */
  protected def fnName: String
  /** Interpreted per-element accumulation. */
  protected def update(acc: Double, xi: Double, yi: Double): Double
  /** Interpreted finisher over the fold result. */
  protected def finish(acc: Double): Double
  /** Codegen statement(s) updating `acc` from locals `xi`/`yi`. */
  protected def updateCode(acc: String): String
  /** Codegen expression producing the final value from `acc`. */
  protected def finishCode(acc: String): String

  final override def dataType: DataType = DoubleType
  final override def nullable: Boolean = true

  final override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$fnName expects array<float|double>, got ${left.dataType} and ${right.dataType}")
  }

  private def elemType(e: org.apache.spark.sql.catalyst.expressions.Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def mayHaveNullElems(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  final override def nullSafeEval(a: Any, b: Any): Any = {
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
      acc = update(acc, xi, yi)
      i += 1
    }
    finish(acc)
  }

  final override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
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
         |    ${updateCode(acc)}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = ${finishCode(acc)}; }
         |}
       """.stripMargin
    })
  }
}
