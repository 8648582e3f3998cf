package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of sum/count aggregates under upserts —
  * the scale path for keeping a BI rollup fresh over a 100 TB fact
  * table (S6's downstream): instead of re-aggregating the world per
  * batch, fold a per-batch DELTA (new rows positive, replaced rows
  * negative) into the maintained table. [[Load.upsert]]'s bucket
  * layout already prunes the replaced-row read to the touched
  * partitions, so a batch's maintenance cost is
  * O(batch + touched buckets + |agg|), independent of fact size.
  *
  * Scope: additive aggregates only (sum/count; avg = sum/n at read
  * time). min/max are NOT maintainable under replacement without
  * re-reading the group and are deliberately absent. Exactness
  * assumes additive-exact value types (integers, decimals, or
  * integer-valued doubles) — true float sums would accumulate
  * order-dependent residue in any engine.
  */
object IncrementalAgg {

  /** Maintained schema: dims..., `n` (row count), `sum_<v>` per value
    * column. Bootstrap (and the verification twin): one full pass.
    */
  def recompute(fact: DataFrame, dims: Seq[String],
                valueCols: Seq[String]): DataFrame =
    aggregateSigned(fact, dims, valueCols, sign = 1)

  /** The batch delta: rows the upsert wrote (`newRows`) count
    * positive, rows it replaced (`oldRows`) negative. Either side
    * may be empty; groups netting to zero fall out in [[applyDelta]].
    */
  def delta(oldRows: DataFrame, newRows: DataFrame, dims: Seq[String],
            valueCols: Seq[String]): DataFrame =
    aggregateSigned(newRows, dims, valueCols, sign = 1)
      .unionByName(aggregateSigned(oldRows, dims, valueCols, sign = -1))

  /** The delta of a CHANGE-FEED frame ([[Snapshots.changes]] — rows
    * tagged `_change_type` insert/delete): inserts count positive,
    * deletes negative. This is CDF-driven MATERIALIZED-VIEW
    * maintenance: the rollup refreshes from the churn the feed
    * already computed — the base table is read by NEITHER side
    * (the feed opened only churned files; the fold touches only
    * `|agg| + |delta|`). Keyed-feed frames work too:
    * update_postimage counts as the insert, update_preimage as the
    * delete.
    */
  def deltaFromChanges(changes: DataFrame, dims: Seq[String],
                       valueCols: Seq[String]): DataFrame =
    delta(
      oldRows = changes.filter(
        col("_change_type").isin("delete", "update_preimage")),
      newRows = changes.filter(
        col("_change_type").isin("insert", "update_postimage")),
      dims, valueCols)

  /** Fold a delta into the maintained table: union + re-sum (sums
    * are additive, so merge IS aggregation), then drop groups whose
    * row count reached zero. One shuffle of |agg| + |delta| — never
    * touches the fact.
    */
  def applyDelta(agg: DataFrame, delta: DataFrame, dims: Seq[String],
                 valueCols: Seq[String]): DataFrame = {
    val sums: Seq[Column] = valueCols.map(v => sum(col(s"sum_$v")).as(s"sum_$v"))
    val all = sum(col("n")).as("n") +: sums
    agg.unionByName(delta)
      .groupBy(dims.map(col): _*)
      .agg(all.head, all.tail: _*)
      .filter(col("n") > 0)
  }

  private def aggregateSigned(df: DataFrame, dims: Seq[String],
                              valueCols: Seq[String], sign: Int): DataFrame = {
    val sums: Seq[Column] =
      valueCols.map(v => (sum(col(v)) * sign).as(s"sum_$v"))
    val all = (count(lit(1)) * sign).as("n") +: sums
    df.groupBy(dims.map(col): _*).agg(all.head, all.tail: _*)
  }
}
