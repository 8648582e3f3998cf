package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Quantized dot product with HIGHER-ORDER-FUNCTION null semantics —
  * the rewrite target of [[RewriteQuantizedDot]].
  *
  * [[QDot]] (the API expression) takes the min length and skips null
  * elements; the declarative formulation
  * `aggregate(zip_with(a, b, (x,y) -> qi(x)*qi(y)), 0L, (s,v) -> s+v)`
  * does neither: `zip_with` pads the shorter array with nulls and a
  * null element poisons the running sum, so ragged or null-holed
  * inputs yield NULL. An optimizer rule must preserve those edges
  * exactly, hence this strict twin: equal-length, null-free arrays
  * produce the identical exact integer dot (QVecSpec cross-checks
  * all three forms); everything else produces NULL, bit-for-bit what
  * the HOF chain produces.
  */
case class QDotStrict(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot64_strict expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qdot64_strict"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val qx = QMath.quantize(x.getFloat(i).toDouble * 1000000.0)
      val qy = QMath.quantize(y.getFloat(i).toDouble * 1000000.0)
      acc = QMath.mulAdd(acc, qx, qy)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc = graft.functions.QMath.mulAdd($acc,
         |      graft.functions.QMath.quantize((double) $a.getFloat($i) * 1000000.0),
         |      graft.functions.QMath.quantize((double) $b.getFloat($i) * 1000000.0));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
