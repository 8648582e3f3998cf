package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

/** Optimizer rule: rewrite the declarative quantized-dot-product
  * formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> cast(round(cast(x as double)
  *     * 1e6, 0) as long) * cast(round(cast(y as double) * 1e6, 0)
  *     as long)), 0L, (s, v) -> s + v)
  *
  * (the shape `graft.llm.Similarity.qdotHof` builds, and the one
  * SURVEY.md §2.9 recommends users write first) into the codegen'd
  * [[QDotStrict]] expression — higher-order functions evaluate an
  * interpreted lambda per element, where the native expression is a
  * tight unboxed loop inside whole-stage codegen.
  *
  * Soundness: [[QDotStrict]] reproduces the HOF chain's null
  * semantics exactly (ragged lengths and null elements yield NULL),
  * so the rewrite is observation-equivalent on EVERY input, not just
  * well-formed embeddings — the precondition for running as an
  * optimizer rule rather than an opt-in API. The match is
  * deliberately exact (float element type, 1e6 scale, 0-scale
  * HALF_UP round, add-merge, identity finish): any other
  * aggregation keeps its HOF plan.
  *
  * Injected via [[graft.GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteQuantizedDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** cast(round(cast(v as double) * 1e6, 0) as long) over exactly
    * the lambda variable `v`.
    */
  private def isQi(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == LongType =>
      c.child match {
        case r: Round =>
          (r.child, r.scale) match {
            case (Multiply(inner: Cast, Literal(s: Double, DoubleType), _),
                  Literal(0, IntegerType)) =>
              s == 1000000.0 && inner.dataType == DoubleType &&
                (inner.child match {
                  case nv: NamedLambdaVariable => nv.exprId == v.exprId
                  case _ => false
                })
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean = a match {
    case nv: NamedLambdaVariable => nv.exprId == b.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(qx, qy, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(s, v, _), Seq(s2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(f: NamedLambdaVariable), _))
          if isFloatArray(a) && isFloatArray(b) &&
            isQi(qx, x) && isQi(qy, y) &&
            sameVar(s, s2) && sameVar(v, v2) && sameVar(fin, f) =>
        QDotStrict(a, b)
    }
}
