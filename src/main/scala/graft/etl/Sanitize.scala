package graft.etl

import org.apache.spark.sql.DataFrame

/** Column-name normalization (reference: P1 `main.py:104`, P2
  * `main.py:30`/`main.py:65`).
  *
  * P1: strip whitespace from every header.
  * P2: sink-side sanitize — lowercase; ' ', '/', '-' → '_'.
  *
  * Pure header rewrites: `toDF` renames columns without touching
  * data, so this is a zero-cost projection in the plan.
  */
object Sanitize {
  /** P2 name rule (reference `main.py:30`). */
  def sanitizeName(c: String): String =
    c.trim.toLowerCase
      .replace(' ', '_').replace('/', '_').replace('-', '_')

  /** P1: trim every header. */
  def stripHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.trim).toIndexedSeq: _*)

  /** P2: sanitize every header for the sink contract. */
  def sanitizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName).toIndexedSeq: _*)

  /** P3 (redesigned): enforce a column contract. The reference
    * silently keeps "columns that exist" (`main.py:380-382`),
    * hiding schema drift; we fail loudly on missing required
    * columns and keep the guarded projection only as an opt-in.
    */
  def project(df: DataFrame, cols: Seq[String], strict: Boolean = true): DataFrame = {
    val present = df.columns.toSet
    val missing = cols.filterNot(present)
    if (strict && missing.nonEmpty)
      throw new IllegalArgumentException(
        s"contract violation: missing columns ${missing.mkString(", ")}")
    df.select(cols.filter(present).map(df.col): _*)
  }
}
