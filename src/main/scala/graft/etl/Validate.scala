package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F5: validation / quarantine split — the reference's defining
  * data-quality feature (`main.py:443-454`; documented intent
  * `README.md:117-118`).
  *
  * We implement the documented intent, not the reference's buggy
  * list-wrapped mask (SURVEY.md §2.7): a row is invalid iff any of
  *   - items / sub_category / category is null,
  *   - quantity < 0, total amount < 0, received amount < 0.
  * Clean rows → fact path; invalid rows → quarantine path.
  *
  * Scale note: the split is computed as two filters over one
  * (optionally cached) upstream plan — each side pushes its
  * predicate to the scan; no driver-side materialization.
  */
object Validate {

  case class Split(clean: DataFrame, quarantine: DataFrame)

  /** Validity expression over post-rename column names. */
  def validExpr(items: Column, subCategory: Column, category: Column,
                quantity: Column, totalAmount: Column, receivedAmount: Column): Column = {
    // coalesce(x<0, false): pandas NaN comparisons are False, so a
    // null amount never quarantines (parity with main.py:448-451).
    def nonNegative(c: Column) = !coalesce(c < 0, lit(false))
    items.isNotNull && subCategory.isNotNull && category.isNotNull &&
      nonNegative(quantity) && nonNegative(totalAmount) && nonNegative(receivedAmount)
  }

  /** Split a frame on an arbitrary validity predicate. */
  def split(df: DataFrame, valid: Column): Split =
    Split(clean = df.filter(valid), quarantine = df.filter(!valid))
}
