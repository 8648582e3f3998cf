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

  /** Incremental SCD2: fold a NEW batch of observations into an
    * existing history without recomputing it — at 100 TB the history
    * is the big table and a day's change log is tiny, so the batch
    * cost must be O(batch + touched keys' current rows), never
    * O(history). Requires append-only time: every batch observation
    * of a key must order after ALL previously applied observations
    * of that key — not merely after its last change point. Collapsed
    * repeats are not retained in the history, so a batch row slotted
    * between a key's last change point and a later collapsed repeat
    * cannot be detected and would silently diverge from the full
    * rebuild; the standard CDC contract (batches consumed in
    * observation order) satisfies the requirement by construction.
    *
    * Mechanics: each touched key's CURRENT row re-enters change
    * detection as a synthetic leading observation, so "batch repeats
    * the current attrs" collapses (no new version) exactly like
    * consecutive repeats inside [[fromChangeLog]]. The local chain's
    * synthetic head then *is* the adjusted current row (its lead()
    * closed valid_to if anything followed), and the rest are new
    * versions renumbered from the key's version counter.
    * Equivalence with a full [[fromChangeLog]] over the concatenated
    * log is pinned in Scd2Spec. All key comparisons are null-safe —
    * a null business key forms one chain, as in [[fromChangeLog]].
    * History is read ONCE: a broadcast mark-join against the batch's
    * (tiny) key set classifies every row as untouched / closed /
    * current-of-touched in a single pass.
    */
  def applyBatch(history: DataFrame, batch: DataFrame, keys: Seq[String],
                 tsCol: String, orderCols: Seq[String],
                 attrs: Seq[String]): DataFrame = {
    val logCols = batch.columns.toSeq
    // null-SAFE key match: Seq-based equi-joins drop null keys, but
    // the window logic chains them — the joins must agree with it
    val affected = batch
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") }: _*)
      .distinct()
      .withColumn("__hit", lit(1))
    val keyMatch = keys.zipWithIndex
      .map { case (k, i) => col(k) <=> col(s"__k$i") }
      .reduce(_ && _)
    val affectedCols = keys.indices.map(i => s"__k$i") :+ "__hit"
    val marked = history.join(broadcast(affected), keyMatch, "left")
    // one history pass: untouched keys and already-closed versions
    // pass through verbatim; only touched keys' current rows re-enter
    // change detection
    val retained = marked
      .filter(col("__hit").isNull || !col("is_current"))
      .drop(affectedCols: _*)
    val currTouched = marked
      .filter(col("__hit") === 1 && col("is_current"))
      .drop(affectedCols: _*)
    val synth = currTouched.select(logCols.map(col): _*)
      .withColumn("__synth", lit(1))
    val local = fromChangeLog(
      synth.unionByName(batch.withColumn("__synth", lit(0))),
      keys, tsCol, orderCols, attrs)
    val base = currTouched.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") } :+
        col("version").as("__basev"): _*)
    val joined = local.join(broadcast(base), keyMatch, "left")
    val outCols = (logCols.filterNot(_ == "__synth") ++
      Seq("valid_from", "valid_to", "version", "is_current")).map(col)
    // the synthetic head, re-stamped with its original version, is
    // the touched key's current row after the batch (valid_to closed
    // by the local lead() iff a new version followed)
    val adjustedCurrent = joined.filter(col("__synth") === 1)
      .withColumn("version", col("__basev"))
      .select(outCols: _*)
    val additions = joined.filter(col("__synth") === 0)
      .withColumn("version",
        col("version") + when(col("__basev").isNotNull, col("__basev") - 1)
          .otherwise(lit(0L)))
      .select(outCols: _*)
    retained.select(outCols: _*)
      .unionByName(adjustedCurrent)
      .unionByName(additions)
  }
}
