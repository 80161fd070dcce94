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

  /** Strip the to-double cast VectorOps inserts; CosineSim reads float
    * elements as double natively with identical results. */
  private def base(e: Expression): Expression = e match {
    case Cast(c, ArrayType(DoubleType, _), _, _) => c
    case other => other
  }

  private object DotAgg {
    /** aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x) */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _), _) =>
        Some((a, b))
      case _ => None
    }
  }

  private object NormSqAgg {
    /** aggregate(a, 0.0, (acc,x) => acc + x*x) */
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(a, Literal(0.0, DoubleType),
        LambdaFunction(Add(_: NamedLambdaVariable,
          Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _), _, _), _)
        if x1.exprId == x2.exprId => Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotAgg(a, b), Multiply(Sqrt(NormSqAgg(na)), Sqrt(NormSqAgg(nb)), _), _)
      if a.semanticEquals(na) && b.semanticEquals(nb) =>
      CosineSim(base(a), base(b))
  }
}

/** Production wiring: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * registers the cosine_sim SQL function and the HOF-cosine rewrite on every
  * session. Tests inject the rule via `spark.experimental.extraOptimizations`
  * (runtime-settable on an existing session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ReplaceCosineHof)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
  }
}
