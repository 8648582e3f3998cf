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
  * Missing columns default Cash='0', Gcash='-' (`main.py:360,366`).
  */
object PaymentType {
  def paymentType(cash: Column, gcash: Column): Column = {
    val c = coalesce(cash.cast("string"), lit("0"))
    val g = coalesce(gcash.cast("string"), lit("-"))
    when(c.isin("0.00", "0"), "Free/Voucher/Discounted")
      .when(c =!= "-", "Cash")
      .when(g =!= "-", "Gcash")
      .otherwise("Credit / Debit")
  }
}
