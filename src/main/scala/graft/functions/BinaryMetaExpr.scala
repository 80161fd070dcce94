package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.BinaryType

/** Shared scaffolding for the binary → metadata-struct parser family
  * (image_dims, audio_meta, video_meta, utf8_stats, mpeg_audio_meta,
  * avc_sps_dims, adts_meta, flac_meta, ogg_opus_meta): the nine
  * expressions differ ONLY in their struct schema and the static parser
  * object their codegen calls, yet each carried its own verbatim copy of
  * the type check, the null-on-unparsed eval, and the codegen template —
  * a template or registration fix had to land nine times (review r11).
  *
  * Subclasses supply `fnName` (error messages), `computeClassName` (a
  * JVM-static `compute(byte[])` returning `InternalRow`, null on
  * refusal — Scala objects expose these via static forwarders, so the
  * generated Java can call them unqualified), `compute` (the SAME method,
  * statically bound, for the interpreted path — eval and codegen rows
  * cannot diverge because both are one call into one parser), and
  * `dataType`. `withNewChildInternal` must stay per-case-class (it needs
  * the concrete `copy`).
  */
abstract class BinaryMetaExpr extends UnaryExpression {
  /** SQL-facing function name, for type-check error messages. */
  def fnName: String
  /** Fully-qualified parser object whose static `compute(byte[])` the
    * generated code calls. */
  def computeClassName: String
  /** Interpreted-path parse — implement as `Parser.compute(b)`, the same
    * static target `computeClassName` names. */
  protected def compute(b: Array[Byte]): InternalRow

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$fnName expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("meta")
      s"""
         |InternalRow $out = $computeClassName.compute($c);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
}

object BinaryMetaExpr {
  /** The arity-1 SQL builder every parser companion repeated — one
    * message format, one `require`. */
  def unaryBuilder(name: String, build: Expression => Expression)
      : Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1,
      s"$name requires exactly 1 argument, got ${exprs.length}")
    build(exprs.head)
  }

  /** Test/session-level SQL registration (production wiring goes through
    * [[graft.plans.GraftExtensions]], which shares `unaryBuilder`). */
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
               build: Expression => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, unaryBuilder(name, build), "built-in")
}
