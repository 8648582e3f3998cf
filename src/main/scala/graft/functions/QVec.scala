package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native Catalyst expression for the quantized dot product of two
  * `array<float>` embeddings (graft.llm.Similarity numeric model:
  * each component → round(x·10⁶) as int64; the integer dot is exact
  * and order-independent, so results are bit-stable).
  *
  * Why a custom Expression instead of the HOF chain
  * (`aggregate(zip_with(...))`): higher-order functions evaluate via
  * interpreted lambdas per element; this expression is a tight
  * codegen'd loop over the unboxed float arrays — the preferred
  * extension tier after built-ins (custom Expression > UDF).
  *
  * Rounding and errors are [[QMath.quantize]]'s: HALF_UP away from
  * zero (midpoints ARE reachable — a float mantissa ×10⁶ has ≤38
  * significant bits, so x·10⁶ = k+0.5 occurs, where `Math.round`'s
  * half-toward-+∞ would diverge from Spark's and DuckDB's `round`
  * on negatives), and NaN/±Inf/overflow throw as ANSI arithmetic
  * does.
  */
case class QDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot64 expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "qdot64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val qx = QMath.quantize(x.getFloat(i).toDouble * 1000000.0)
        val qy = QMath.quantize(y.getFloat(i).toDouble * 1000000.0)
        acc = QMath.mulAdd(acc, qx, qy)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $qx = graft.functions.QMath.quantize((double) $a.getFloat($i) * 1000000.0);
         |    long $qy = graft.functions.QMath.quantize((double) $b.getFloat($i) * 1000000.0);
         |    $acc = graft.functions.QMath.mulAdd($acc, $qx, $qy);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QVec {
  import org.apache.spark.sql.{GraftShim => ExpressionUtils}

  /** Register qdot64 in the session's function registry (idempotent)
    * so it is also callable from SQL text.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qdot64", exprs => QDot(exprs(0), exprs(1)), "built-in")

  /** Exact quantized dot product of two float-array columns. */
  def qdot64(a: Column, b: Column): Column =
    ExpressionUtils.column(QDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Exact quantized squared norm. */
  def qnorm2_64(a: Column): Column = qdot64(a, a)
}
