package graft.functions

/** Shared quantization arithmetic for the QDot family — one
  * definition of `round(x·10⁶)` that is EXACTLY Spark's
  * `round(double, 0)` + ANSI `CAST(double AS LONG)` composition
  * (and DuckDB's `round` + `CAST(... AS BIGINT)`, which the q34/q45
  * oracles use):
  *
  *  - HALF_UP AWAY FROM ZERO at midpoints. Midpoints ARE reachable:
  *    a 24-bit float mantissa times 10⁶ (= 2⁶·5⁶) has ≤38
  *    significant bits, so e.g. `-0.0234375f·10⁶ = -23437.5`
  *    exactly — where `Math.round` (half toward +∞) would give
  *    −23437 and HALF_UP gives −23438.
  *  - NaN/±Inf and long-range overflow THROW (ArithmeticException,
  *    the family Spark's ANSI cast errors extend) instead of
  *    wrapping — the HOF formulation fails loudly on these inputs
  *    under ANSI mode (default-on in Spark 4), so the native
  *    expressions must too.
  *
  * `floor(|d| + 0.5)` equals decimal HALF_UP for every |d| < 2⁵²
  * (0.5 is exactly representable there, so the add is exact and no
  * boundary can be crossed); at |d| ≥ 2⁵² doubles are integral and
  * the value is returned unchanged (avoiding the ties-to-even drift
  * of `|d| + 0.5` at ulp ≥ 1).
  *
  * Standalone object ⇒ the JVM class gets static forwarders, so
  * generated code calls `graft.functions.QMath.quantize(d)`
  * directly.
  */
object QMath {
  private final val TwoTo52 = 4503599627370496.0
  private final val LongMaxD = 9.223372036854776e18

  /** `(long) round(x·10⁶, 0)` with Spark/DuckDB HALF_UP + ANSI
    * error semantics. Input is the already-multiplied double.
    */
  def quantize(d: Double): Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(s"qdot64: cannot quantize $d to long")
    val a = math.abs(d)
    val r = if (a >= TwoTo52) a else math.floor(a + 0.5)
    if (r >= LongMaxD)
      throw new ArithmeticException(s"qdot64: quantized $d overflows long")
    val q = r.toLong
    if (d < 0) -q else q
  }

  /** Overflow-checked multiply-accumulate (the ANSI-faithful loop
    * body): acc + qx·qy, throwing on long overflow like the HOF's
    * ANSI `Multiply`/`Add`.
    */
  def mulAdd(acc: Long, qx: Long, qy: Long): Long =
    Math.addExact(acc, Math.multiplyExact(qx, qy))
}
