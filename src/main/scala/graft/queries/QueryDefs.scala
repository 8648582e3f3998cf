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
  *    never the raw ts;
  *  - decimal→double casts are only engine-identical while the
  *    decimal's unscaled value fits 2^53 (Spark rounds once, DuckDB's
  *    int128 decimals round twice) — plain money sums are safe,
  *    but second-moment sums (sum of squares) must round their
  *    derived stat to a fixed decimal place on both engines (q80);
  *  - derived doubles that ARE emitted come from one identical
  *    sequence of IEEE ops on exactly-equal inputs (interpolation,
  *    rates, ratios) — never from engine-internal float aggregation
  *    (stddev/avg over doubles, window float sums).
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

  /** One-pass multiset equality: TRUE iff `a` and `b` hold exactly
    * the same rows with the same multiplicities (columns matched by
    * name; `b` must carry `a`'s columns). Replaces the
    * `a.exceptAll(b).count==0 && b.exceptAll(a).count==0` pin shape —
    * Spark plans EACH exceptAll as a ±1 union-aggregate-replicate of
    * the PAIR, so the old shape evaluated both subplans twice and
    * aggregated twice across two actions; this is one ±1
    * union-aggregate and one limit-1 probe. Identical boolean: all
    * per-row nets are 0 ⟺ both directed multiset differences are
    * empty (grouping and set ops share NULL-safe / NaN-normalizing
    * equality).
    */
  def sameMultiset(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    val w = Iterator.iterate("__ms_w")(_ + "_").find(!cols.contains(_)).get
    a.withColumn(w, lit(1L))
      .unionByName(b.select(cols.map(col): _*).withColumn(w, lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col(w)).as(w))
      .filter(col(w) =!= 0L)
      .isEmpty
  }

  /** DuckDB fragment mirroring [[moneySum]]. */
  def oraSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  def oraAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
