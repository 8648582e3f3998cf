package graft.llm

/** Engine-independent `round(num/den, 6)` for NONNEGATIVE exact
  * integer numerators and positive integer denominators.
  *
  * `round(double, 6)` is not portable: Spark rounds the SHORTEST
  * DECIMAL form of the double (BigDecimal(Double.toString), HALF_UP)
  * while DuckDB rounds the BINARY value — and they disagree whenever
  * the shortest decimal lands on an exact 7th-decimal midpoint the
  * binary value sits just below (first observed at sf1 in q114:
  * 0.2585355 → 0.258536 vs 0.258535; see Importance.logWeights).
  * Rounding the TRUE RATIONAL integer-side is exact in both engines:
  * half-up(num/den · 10⁶) = (2·num·10⁶ + den) div (2·den) for
  * num ≥ 0, den > 0, and the final /1e6 is one exact-input IEEE
  * division both replay bit-identically.
  *
  * Overflow bound: 2·num·10⁶ must fit a long ⇒ num < 4.6e12 — far
  * above any per-document count these call sites feed.
  *
  * Emitted as SQL fragments (not Columns) because integer division
  * has no public `Column` operator: Spark spells it `div`, DuckDB
  * spells it `//` — the only token the two mirrors differ in.
  */
object ExactRound {

  /** The exact integer 10⁶-scaled half-up numerator of num/den —
    * the long [[round6Expr]] divides by 1e6. Threshold on THIS
    * integer when a boolean verdict must stay consistent with the
    * displayed rounded ratio (a flag computed from the unrounded
    * double can disagree with the emitted value at boundaries).
    */
  def micro6Expr(num: String, den: String): String =
    s"(2L * ($num) * 1000000L + ($den)) div (2L * ($den))"

  /** DuckDB oracle mirror of [[micro6Expr]]. */
  def micro6Sql(num: String, den: String): String =
    s"(2 * ($num) * 1000000 + ($den)) // (2 * ($den))"

  /** Spark SQL fragment (use inside `expr(...)`/`selectExpr`). */
  def round6Expr(num: String, den: String): String =
    s"CAST(${micro6Expr(num, den)} AS DOUBLE) / 1e6"

  /** DuckDB oracle mirror of [[round6Expr]]. */
  def round6Sql(num: String, den: String): String =
    s"CAST(${micro6Sql(num, den)} AS DOUBLE) / 1e6"
}
