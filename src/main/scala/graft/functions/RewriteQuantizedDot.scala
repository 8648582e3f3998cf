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
  * Soundness: [[QDotStrict]] replays the HOF chain's evaluation
  * order exactly — per-index left-then-right quantization with
  * null short-circuit, then the fold — so NULLs, values, AND
  * ArithmeticExceptions land on the same inputs. That equivalence
  * holds only under ANSI arithmetic: with
  * `spark.sql.ansi.enabled=false` the HOF chain WRAPS on overflow
  * and nulls NaN casts, and `try_*` (EvalMode.TRY) formulations
  * return NULL where QDotStrict throws. The rule therefore fires
  * only when the session is in ANSI mode and every matched
  * Cast/Multiply/Add carries EvalMode.ANSI; any other mode keeps
  * its HOF plan. The match is otherwise deliberately exact (float
  * element type, 1e6 scale, 0-scale HALF_UP round, add-merge,
  * identity finish).
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
    case c: Cast if c.dataType == LongType && c.evalMode == EvalMode.ANSI =>
      c.child match {
        case r: Round =>
          (r.child, r.scale) match {
            case (Multiply(inner: Cast, Literal(s: Double, DoubleType), mulMode),
                  Literal(0, IntegerType)) =>
              mulMode.evalMode == EvalMode.ANSI &&
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
    // QDotStrict throws on NaN/overflow like ANSI arithmetic; in
    // LEGACY mode the HOF chain wraps/nulls instead, so outside ANSI
    // the rewrite would not be observation-equivalent — skip it.
    if (!conf.ansiEnabled) plan
    else plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(qx, qy, mulMode), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(s, v, addMode), Seq(s2: NamedLambdaVariable, v2: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(f: NamedLambdaVariable), _))
          if mulMode.evalMode == EvalMode.ANSI && addMode.evalMode == EvalMode.ANSI &&
            isFloatArray(a) && isFloatArray(b) &&
            isQi(qx, x) && isQi(qy, y) &&
            sameVar(s, s2) && sameVar(v, v2) && sameVar(fin, f) =>
        QDotStrict(a, b)
    }
}
