package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composable higher-order-function cosine
  * pattern (`aggregate(zip_with(a,b,*), 0.0, +) / (sqrt(aggregate(a,0.0,
  * acc+x*x)) * sqrt(aggregate(b,...)))` — what [[graft.functions.VectorOps]]
  * and hand-written user code produce) into the fused codegen kernel
  * [[graft.functions.CosineSim]]. HOFs are CodegenFallback (interpreted per
  * element, intermediate array per call); the kernel is one codegen'd loop —
  * measured 38x at 4M pairs (BASELINE.md) with bit-identical results
  * (CosineSimSpec). A miss on any sub-pattern leaves the tree unchanged.
  */
object ReplaceCosineHof extends Rule[LogicalPlan] {

  /** Strip the to-double cast VectorOps inserts — but ONLY when the cast's
    * source is already a float/double array, which CosineSim reads natively
    * with identical results. Stripping unconditionally would hand CosineSim
    * e.g. an array<int> child inside the optimizer, where
    * checkInputDataTypes never re-runs — its element reads would then pull
    * 8 bytes from 4-byte slots, returning garbage with no error. Any other
    * source type keeps the cast, so the kernel still sees array<double>. */
  private def base(e: Expression): Expression = e match {
    case Cast(c, ArrayType(DoubleType, _), _, _) => c.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType | DoubleType, _) => c
      case _ => e
    }
    case other => other
  }

  /** The lambda `(p,q) => p*q` (either operand order) over exactly its own
    * two DISTINCT arguments — `(x,y) => x*x` must NOT match (not a dot
    * product), nor may an operand be a capture from an enclosing lambda. */
  private def isPairwiseProduct(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Multiply(p: NamedLambdaVariable, q: NamedLambdaVariable, _), args, _)
      if args.size == 2 =>
      val ids = args.map(_.exprId)
      ids.distinct.size == 2 && p.exprId != q.exprId && Set(p.exprId, q.exprId) == ids.toSet
    case _ => false
  }

  /** The lambda `(acc,x) => acc+x` (either operand order), operands bound to
    * exactly the lambda's two arguments. */
  private def isPlainSum(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Add(p: NamedLambdaVariable, q: NamedLambdaVariable, _), args, _)
      if args.size == 2 =>
      val ids = args.map(_.exprId)
      ids.distinct.size == 2 && p.exprId != q.exprId && Set(p.exprId, q.exprId) == ids.toSet
    case _ => false
  }

  /** aggregate()'s implicit finish lambda `acc => acc`; anything else
    * post-processes the sum and must block the rewrite. */
  private def isIdentityFinish(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) => v.exprId == arg.exprId
    case _ => false
  }

  private object DotAgg {
    /** aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x) */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
        ZipWith(a, b, mul: LambdaFunction),
        Literal(0.0, DoubleType),
        merge: LambdaFunction, finish: LambdaFunction)
        if isPairwiseProduct(mul) && isPlainSum(merge) && isIdentityFinish(finish) =>
        Some((a, b))
      case _ => None
    }
  }

  private object NormSqAgg {
    /** aggregate(a, 0.0, (acc,x) => acc + x*x) — acc bound to the lambda's
      * accumulator argument, x (twice) to its element argument. */
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(a, Literal(0.0, DoubleType),
        LambdaFunction(Add(acc: NamedLambdaVariable,
          Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _), args, _),
        finish: LambdaFunction)
        if args.size == 2 && acc.exprId == args.head.exprId &&
          x1.exprId == x2.exprId && x1.exprId == args(1).exprId &&
          isIdentityFinish(finish) => Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // The replaced Divide's own evalMode decides zero-denominator behavior
    // (ANSI throws, LEGACY/TRY null) — propagated, not re-read from the
    // conf, so the rewrite is semantics-preserving even if the conf changed
    // between analysis and optimization.
    // Spark 4.1 wraps the mode in NumericEvalContext — compare the
    // contained evalMode (a bare `ctx == EvalMode.ANSI` type-mismatches
    // and is ALWAYS false, silently downgrading ANSI throw-on-zero to
    // null: caught as a scalac warning in r11)
    case Divide(DotAgg(a, b), Multiply(Sqrt(NormSqAgg(na)), Sqrt(NormSqAgg(nb)), _), ctx)
      if a.semanticEquals(na) && b.semanticEquals(nb) =>
      CosineSim(base(a), base(b), failOnError = ctx.evalMode == EvalMode.ANSI)
  }
}

/** Production wiring: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * registers the engine's kernel SQL functions (cosine_sim, dot_product,
  * repetition_stats, token_entropy, srp_buckets) and the HOF-cosine rewrite
  * on every session — the full curation-function surface is usable from
  * plain `spark.sql` without touching the Scala API. Tests inject the rule
  * via `spark.experimental.extraOptimizations` (runtime-settable on an
  * existing session) and functions via each companion's `register`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def fn(name: String, exprInfoCls: Class[_],
                 builder: Seq[Expression] => Expression) =
    (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new ExpressionInfo(exprInfoCls.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ReplaceCosineHof)
    ext.injectFunction(fn("cosine_sim", classOf[CosineSim], exprs => {
      require(exprs.length == 2,
        s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
      CosineSim(exprs(0), exprs(1))
    }))
    ext.injectFunction(fn("dot_product", classOf[graft.functions.DotProduct], exprs => {
      require(exprs.length == 2,
        s"dot_product requires exactly 2 arguments, got ${exprs.length}")
      graft.functions.DotProduct(exprs(0), exprs(1))
    }))
    ext.injectFunction(fn("repetition_stats",
      classOf[graft.functions.RepetitionStatsExpr], exprs => {
        require(exprs.length == 1,
          s"repetition_stats requires exactly 1 argument, got ${exprs.length}")
        graft.functions.RepetitionStatsExpr(exprs.head)
      }))
    ext.injectFunction(fn("token_entropy",
      classOf[graft.functions.TokenEntropyExpr], exprs => {
        require(exprs.length == 1,
          s"token_entropy requires exactly 1 argument, got ${exprs.length}")
        graft.functions.TokenEntropyExpr(exprs.head)
      }))
    ext.injectFunction(fn("srp_buckets",
      classOf[graft.functions.SrpBucketsExpr],
      graft.functions.SrpBucketsExpr.fromSql))
    ext.injectFunction(fn("image_dims",
      classOf[graft.functions.ImageDimsExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("image_dims",
        graft.functions.ImageDimsExpr(_))))
    ext.injectFunction(fn("audio_meta",
      classOf[graft.functions.AudioMetaExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("audio_meta",
        graft.functions.AudioMetaExpr(_))))
    ext.injectFunction(fn("video_meta",
      classOf[graft.functions.VideoMetaExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("video_meta",
        graft.functions.VideoMetaExpr(_))))
    ext.injectFunction(fn("utf8_stats",
      classOf[graft.functions.Utf8StatsExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("utf8_stats",
        graft.functions.Utf8StatsExpr(_))))
    ext.injectFunction(fn("mpeg_audio_meta",
      classOf[graft.functions.MpegAudioMetaExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("mpeg_audio_meta",
        graft.functions.MpegAudioMetaExpr(_))))
    ext.injectFunction(fn("avc_sps_dims",
      classOf[graft.functions.AvcSpsDimsExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("avc_sps_dims",
        graft.functions.AvcSpsDimsExpr(_))))
    ext.injectFunction(fn("adts_meta",
      classOf[graft.functions.AdtsMetaExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("adts_meta",
        graft.functions.AdtsMetaExpr(_))))
    ext.injectFunction(fn("flac_meta",
      classOf[graft.functions.FlacMetaExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("flac_meta",
        graft.functions.FlacMetaExpr(_))))
    ext.injectFunction(fn("ogg_opus_meta",
      classOf[graft.functions.OggOpusMetaExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("ogg_opus_meta",
        graft.functions.OggOpusMetaExpr(_))))
    ext.injectFunction(fn("id3v2_tags",
      classOf[graft.functions.Id3v2TagsExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("id3v2_tags",
        graft.functions.Id3v2TagsExpr(_))))
    ext.injectFunction(fn("jpeg_exif",
      classOf[graft.functions.JpegExifExpr],
      graft.functions.BinaryMetaExpr.unaryBuilder("jpeg_exif",
        graft.functions.JpegExifExpr(_))))
  }
}
