package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Nearest-centroid cell id for one vector in ONE fused pass — the
  * quantizer-apply kernel behind [[graft.operators.IvfIndex.assignInline]].
  *
  * The composable form unrolls `least` over nlist `struct(l2_dist, cell)`
  * subtrees — O(nlist) generated code that crosses janino's 64 KB method
  * limit near nlist ≈ 300 (observed on the r16 append ladder at the
  * production occupancy schedule, nlist = n/250: every rung past 64k
  * vectors fell out of whole-stage codegen exactly where the 100 TB
  * story needs it most). This kernel holds the centroid matrix as ONE
  * flattened reference object and loops in the generated code, so the
  * assignment projection is O(1) code size at ANY nlist and the corpus
  * pass stays map-only whole-stage codegen.
  *
  * Bit-parity contract with the unrolled form (asserted in
  * OperatorsSpec): per centroid the accumulation is the same
  * ascending-index `acc += (xi−ci)²` double sequence as [[L2Dist]],
  * finished by the same `sqrt`, compared strictly ascending over cell
  * ids — so the winner is the lowest cell id among minimal distances
  * (ties toward the LOWER cell, the [[graft.operators.IvfIndex.assign]]
  * rule), and an all-NaN distance row degrades to the lowest cell id
  * exactly as struct ordering does (NaN compares equal-and-largest).
  * Null semantics: null vector, dim mismatch, or any null element → null
  * (callers that need a descriptive error run their vector guard first,
  * as assignInline's checkedVectors does — the kernel itself must be
  * total and refuse, never throw, mid-corpus).
  */
object CellArgmin {

  /** Kernel entry invoked from generated code AND the interpreted eval —
    * one body, the two paths cannot diverge. `cents` is row-major
    * (centroid c occupies [c·dim, c·dim+dim)); returns the winning entry
    * of `cells`, or null to refuse. */
  def compute(arr: ArrayData, cents: Array[Double], cells: Array[Int],
              dim: Int, isFloat: Boolean): java.lang.Integer = {
    val n = arr.numElements()
    if (n != dim) return null
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val v = new Array[Double](n)
    j = 0
    while (j < n) {
      v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    var best = -1
    var bestD = Double.PositiveInfinity
    val nCells = cells.length
    var c = 0
    while (c < nCells) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      while (i < n) {
        val d = v(i) - cents(off + i)
        acc += d * d
        i += 1
      }
      val dist = math.sqrt(acc)
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    // every distance NaN (a NaN element in the vector): strict < never
    // fired — the unrolled struct ordering ties all distances equal and
    // falls to the lowest cell id, so match it
    java.lang.Integer.valueOf(cells(if (best < 0) 0 else best))
  }
}

/** `cell_argmin(v)` → int cell id — see [[CellArgmin]]. The centroid
  * matrix and cell-id mapping are constructor parameters (driver-side
  * data, shipped once per task as a reference object, never per row). */
case class CellArgminExpr(child: Expression, cells: Array[Int],
                          cents: Array[Double]) extends UnaryExpression {

  private def dim: Int = cents.length / cells.length

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  /** Shape checks live HERE, not in constructor `require`s (ADVICE r16):
    * Catalyst copies expressions freely during tree transforms, and a
    * constructor throw there surfaces as an opaque TreeNode crash instead
    * of an analysis-time TypeCheckFailure with the offending shape. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      if (cells.isEmpty) TypeCheckResult.TypeCheckFailure(
        "cell_argmin: centroid set must be non-empty")
      else if (cents.length % cells.length != 0) TypeCheckResult.TypeCheckFailure(
        s"cell_argmin: matrix length ${cents.length} not a multiple of ${cells.length} cells")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cell_argmin expects array<float|double>, got $t")
  }

  /** Array fields compare by REFERENCE under the synthesized case-class
    * equals, so two semantically identical cell_argmin expressions would
    * never compare equal — Catalyst canonicalization, common-subexpression
    * elimination, and cached-plan matching all key on expression equality
    * (ADVICE r16). Content-compare the matrices instead. */
  override def equals(o: Any): Boolean = o match {
    case that: CellArgminExpr =>
      child == that.child &&
        java.util.Arrays.equals(cells, that.cells) &&
        java.util.Arrays.equals(cents, that.cents)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(cells)) +
      java.util.Arrays.hashCode(cents)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    CellArgmin.compute(input.asInstanceOf[ArrayData], cents, cells, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("argminCents", cents, "double[]")
    val cellsRef = ctx.addReferenceObj("argminCells", cells, "int[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Integer $r = graft.functions.CellArgmin.compute(
         |  $c, $centsRef, $cellsRef, $dim, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CellArgminExpr {
  /** Column-level entry point: `cells(i)` labels the centroid at matrix
    * rows [i·dim, i·dim+dim) of the row-major `cents`. */
  def cell_argmin(v: Column, cells: Array[Int], cents: Array[Double]): Column =
    ColumnShim.column(CellArgminExpr(ColumnShim.expression(v), cells, cents))
}
