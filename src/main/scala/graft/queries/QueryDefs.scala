package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the driver-checked query surface.
  *
  * Oracle-determinism rules (every registered query obeys these so
  * the DuckDB hash-compare is bit-stable):
  *  - money/double sums go through DECIMAL(18,4): the per-row
  *    double→decimal conversion is order-independent and identical
  *    in Spark and DuckDB, the decimal sum is exact, and the final
  *    cast to double is exact — no float-summation-order drift;
  *  - ordering is always on exact-typed keys (never raw doubles);
  *  - `regexp_extract` misses are normalized ''→null on both sides
  *    (Spark `nullIfEmpty`, DuckDB `NULLIF(...,'')`);
  *  - event timestamps are ns-precision in parquet; Spark truncates
  *    to µs, so queries only emit derived values (date_trunc/epoch),
  *    never the raw ts.
  */
object QueryDefs {
  type Q = (SparkSession, String) => DataFrame

  /** Exact order-independent sum of a double expression. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact mean: exact decimal sum divided by count, in doubles —
    * one deterministic IEEE division on both engines.
    */
  def moneyAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1))

  /** DuckDB fragment mirroring [[moneySum]]. */
  def oraSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  def oraAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
