package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** U1: payment-type derivation — the reference's only row-wise UDF
  * (`main.py:356-371`, pandas `apply(axis=1)`), re-expressed as a
  * pure `when/otherwise` chain so it stays inside whole-stage
  * codegen. Engine policy: native expressions first; UDFs only
  * where Catalyst has no primitive (SURVEY.md §2.6).
  *
  * Reference semantics:
  *   Cash in {'0.00','0'}        ⇒ 'Free/Voucher/Discounted'
  *   Cash  != '-'                ⇒ 'Cash'
  *   Gcash != '-'                ⇒ 'Gcash'
  *   else                        ⇒ 'Credit / Debit'
  * NULL values stringify: pandas `str(row.get('Cash', 0))` turns a
  * NaN CELL into the string `'nan'`, which is ≠ '-' and so lands in
  * the 'Cash' branch (and a NaN Gcash in 'Gcash') — mirrored here
  * with a `'nan'` coalesce. A MISSING column defaults to `'0'`/`'-'`
  * in the reference; in this engine the P3 contract projection
  * guarantees both columns exist, so value semantics are the whole
  * story (callers without the columns pass `lit("0")`/`lit("-")`).
  */
object PaymentType {
  def paymentType(cash: Column, gcash: Column): Column = {
    val c = coalesce(cash.cast("string"), lit("nan"))
    val g = coalesce(gcash.cast("string"), lit("nan"))
    when(c.isin("0.00", "0"), "Free/Voucher/Discounted")
      .when(c =!= "-", "Cash")
      .when(g =!= "-", "Gcash")
      .otherwise("Credit / Debit")
  }
}
