package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word BPE merge engine with a FROZEN rule list — the imperative
  * kernel behind [[BpeEncodeCount]]. One instance is constructed on the
  * driver (rules are fixed at plan time), shipped via the codegen
  * reference array, and shared by interpreted eval and generated code, so
  * the two paths cannot diverge.
  *
  * Semantics match [[graft.operators.BpeVocab.mergePairCol]] exactly:
  * symbols are the word's chars plus the `</w>` marker; each rule applies
  * exhaustively, greedy left-to-right, in rule order. The merge is an
  * in-place two-pointer sweep — O(|word|) per rule, zero allocation
  * beyond the symbol array — where the HOF `aggregate(slice ++ concat)`
  * form re-copies the accumulator per element (O(|word|²) per rule,
  * interpreted: measured 9.3 s for qe20b at sf0.1 vs 0.4 s with this
  * kernel). */
final class BpeWordEncoder(rules: Array[Array[String]]) extends Serializable {

  /** Token count of one word after applying every rule. Base symbols are
    * CODE POINTS, not UTF-16 code units: `split(word, "")` (the learner's
    * `symbolsCol` and the HOF twin) never splits a surrogate pair — Java's
    * regex engine advances zero-width matches by code point — so a non-BMP
    * character (emoji, astral CJK) must be ONE symbol here too, or the
    * kernel diverges from the documented mergePairCol contract. */
  def count(word: UTF8String): Long = {
    val w = word.toString
    val n = w.length
    val syms = new Array[String](w.codePointCount(0, n) + 1)
    var i = 0
    var s = 0
    while (i < n) {
      val cc = Character.charCount(w.codePointAt(i))
      syms(s) = w.substring(i, i + cc)
      s += 1
      i += cc
    }
    syms(s) = BpeWordEncoder.EndOfWord
    var len = s + 1
    var r = 0
    while (r < rules.length) {
      val a = rules(r)(0); val b = rules(r)(1); val ab = rules(r)(2)
      var rd = 0
      var wr = 0
      while (rd < len) {
        val cur = syms(rd)
        if (wr > 0 && syms(wr - 1).equals(a) && cur.equals(b)) syms(wr - 1) = ab
        else { syms(wr) = cur; wr += 1 }
        rd += 1
      }
      len = wr
      r += 1
    }
    len.toLong
  }
}

object BpeWordEncoder {
  val EndOfWord = "</w>"
  def apply(rules: Seq[(String, String)]): BpeWordEncoder =
    new BpeWordEncoder(rules.map(r => Array(r._1, r._2, r._1 + r._2)).toArray)
}

/** Total BPE token count of a token-array column under a frozen merge
  * list — a native Catalyst expression with whole-stage codegen (the
  * SURVEY §4.2 extension point c used by CosineSim/DotProduct): the rule
  * list rides in the plan, the per-word merge is one imperative sweep per
  * rule, and the expression stays inside the codegen'd projection — so
  * encoding a corpus is a map-only scan at any scale.
  *
  * Null semantics mirror the HOF form it replaced
  * (`aggregate(tokens, 0, acc + count(w))`): null array → null, any null
  * token → null, empty array → 0. */
case class BpeEncodeCount(child: Expression, rules: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_count expects array<string>, got $t")
  }

  @transient private lazy val encoder = BpeWordEncoder(rules)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      total += encoder.count(arr.getUTF8String(i))
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val encRef = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeWordEncoder].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val (n, i, tot) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("tot"))
      s"""
         |int $n = $c.numElements();
         |long $tot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $tot += $encRef.count($c.getUTF8String($i));
         |}
         |if (!${ev.isNull}) { ${ev.value} = $tot; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeCount {
  /** Column-level entry point: total BPE token count of `tokens` under
    * the frozen `rules`. */
  def bpe_encode_count(tokens: Column, rules: Seq[(String, String)]): Column =
    ColumnShim.column(BpeEncodeCount(ColumnShim.expression(tokens), rules))
}
