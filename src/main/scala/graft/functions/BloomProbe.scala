package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col)` over a driver-built [[BloomFilter]] — a
  * native Catalyst predicate with whole-stage codegen (SURVEY §4.2
  * extension point c, same pattern as [[BpeEncodeCount]]: the sketch rides
  * the plan via the codegen reference array, shared by interpreted eval
  * and generated code so the two paths cannot diverge).
  *
  * This is the scan-side pre-filter of the bloom decontamination path
  * ([[graft.operators.Decontaminate.contaminationBloom]]): a
  * megabyte-sized sketch of the benchmark's shingle set answers "possibly
  * contaminated?" inside the corpus scan — a map-only codegen'd probe
  * with no shuffle and no broadcast of the exact string set. False
  * positives only (never false negatives), so a downstream exact join on
  * the tiny surviving slice restores exactness.
  *
  * The probe hashes the UTF-8 bytes ([[BloomFilter#mightContainBinary]]),
  * which is bit-compatible with how `DataFrameStatFunctions.bloomFilter`
  * inserts strings (`putString` = UTF-8 bytes), so build and probe agree. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bloomRef.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-level entry point. */
  def bloom_might_contain(col: Column, bloom: BloomFilter): Column =
    ColumnShim.column(BloomMightContain(ColumnShim.expression(col), bloom))
}
