package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) history builder — the
  * history-preserving sibling of [[Load.upsert]]'s latest-wins
  * (SCD1) merge. The reference's sink keeps only the newest row per
  * business key (`main.py:27-59`); warehouses that need "what was
  * this customer's segment on date X" keep every version with a
  * validity interval instead. This derives that versioned history
  * from a change log in one pass.
  *
  * Scale shape: both window passes share one hash partitioning on
  * the business key (the filter between them preserves partitioning
  * AND sort order, so Catalyst plans a single Exchange + Sort for
  * the whole chain — pinned in PlanQualitySpec). Cost at 100 TB is
  * one shuffle of the change log, grouped by key; no self-join, no
  * driver state.
  */
object Scd2 {

  /** Collapse a change log into SCD2 history rows.
    *
    * Input: one row per observation, ordered within a key by
    * `orderCols` (must be a deterministic total order per key —
    * include a unique id as the last tie-break). A row opens a new
    * version iff any of `attrs` differs (null-safely) from the
    * previous observation of the same key; consecutive identical
    * observations collapse into one version.
    *
    * Output: the change-point rows with
    *  - `valid_from` = value of `tsCol` at the change point,
    *  - `valid_to`   = next version's `valid_from` (null = current),
    *  - `version`    = 1-based version number per key (long),
    *  - `is_current` = `valid_to IS NULL`.
    */
  def fromChangeLog(log: DataFrame, keys: Seq[String], tsCol: String,
                    orderCols: Seq[String], attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "SCD2 needs at least one tracked attribute")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val attrChanged: Column = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    // row 1 always opens version 1 (lag is null there, and <=> would
    // call a leading null attr "unchanged")
    val changes = log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || attrChanged)
      .filter(col("__chg"))
      .drop("__rn", "__chg")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
