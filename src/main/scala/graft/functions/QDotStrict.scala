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
  * inputs yield NULL — but a NaN/Inf element still THROWS under ANSI
  * because `zip_with` materializes every product before the fold
  * runs. This twin replays that evaluation order index by index:
  * quantize left, and only if left is non-null quantize right
  * (Multiply short-circuits on a null left, so a null element
  * shields a NaN opposite it); multiply-overflow checked per
  * product; the fold adds products in order and stops adding once
  * poisoned by a null (so post-null add-overflow cannot throw, just
  * like `Add(null, v)`). Equal-length null-free arrays produce the
  * identical exact integer dot (QVecSpec cross-checks all three
  * forms); ragged/null-holed inputs yield NULL unless a reachable
  * element quantization or arithmetic step throws first —
  * ArithmeticException-for-ArithmeticException with the HOF chain
  * (error *classes* match at that granularity; messages differ).
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
    val xn = x.numElements()
    val yn = y.numElements()
    val n = math.max(xn, yn)
    var acc = 0L
    var poisoned = false
    var i = 0
    while (i < n) {
      // Multiply(qi(x_i), qi(y_i)): left first; right only if left
      // non-null — quantize throws land exactly where the HOF's do.
      val xNull = i >= xn || x.isNullAt(i)
      var pNull = true
      var p = 0L
      if (!xNull) {
        val qx = QMath.quantize(x.getFloat(i).toDouble * 1000000.0)
        val yNull = i >= yn || y.isNullAt(i)
        if (!yNull) {
          val qy = QMath.quantize(y.getFloat(i).toDouble * 1000000.0)
          p = Math.multiplyExact(qx, qy)
          pNull = false
        }
      }
      // fold step: Add(null, v) stays null without adding
      if (!poisoned) {
        if (pNull) poisoned = true
        else acc = Math.addExact(acc, p)
      }
      i += 1
    }
    if (poisoned) null else acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val poisoned = ctx.freshName("poisoned")
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val pNull = ctx.freshName("pNull")
      val qx = ctx.freshName("qx")
      s"""
         |final int $xn = $a.numElements();
         |final int $yn = $b.numElements();
         |final int $n = java.lang.Math.max($xn, $yn);
         |long $acc = 0L;
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $pNull = true;
         |  long $p = 0L;
         |  if ($i < $xn && !$a.isNullAt($i)) {
         |    long $qx = graft.functions.QMath.quantize((double) $a.getFloat($i) * 1000000.0);
         |    if ($i < $yn && !$b.isNullAt($i)) {
         |      $p = java.lang.Math.multiplyExact($qx,
         |        graft.functions.QMath.quantize((double) $b.getFloat($i) * 1000000.0));
         |      $pNull = false;
         |    }
         |  }
         |  if (!$poisoned) {
         |    if ($pNull) { $poisoned = true; }
         |    else { $acc = java.lang.Math.addExact($acc, $p); }
         |  }
         |}
         |if ($poisoned) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
