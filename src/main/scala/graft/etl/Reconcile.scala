package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every business key across two
  * table versions as `added` / `removed` / `changed` / `unchanged`
  * — the data-diff primitive behind audit reports, CDC backfills,
  * and "what did this batch do" checks over the upsert sink
  * ([[Load.upsert]]).
  *
  * Shape at 100 TB: ONE full-outer sort-merge join on the business
  * key — both sides shuffle once on the same key, so the diff costs
  * the same as any key-partitioned join of the two snapshots; the
  * per-column comparison is a map-side null-safe equality chain
  * (`<=>`), no row multiplication, no collect. Compare columns are
  * value-compared, so a key present in both with every compare
  * column null-safe-equal is `unchanged`.
  */
object Reconcile {

  /** Diff `cur` against `prev` on `keys`; `compareCols` decide
    * `changed` vs `unchanged`. Output: keys, `diff_status`, and each
    * compare column twice (`<c>_prev`, `<c>_cur` — null on the
    * absent side).
    */
  def diff(prev: DataFrame, cur: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    val p = prev.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_prev", lit(1))
      .select(keys.map(col) :+ col("__in_prev") :+
        struct(compareCols.map(col): _*).as("__pc"): _*)
    val c = cur.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_cur", lit(1))
      .select(keys.map(col) :+ col("__in_cur") :+
        struct(compareCols.map(col): _*).as("__cc"): _*)
    val changed = compareCols
      .map(cc => !(col("__pc").getField(cc) <=> col("__cc").getField(cc)))
      .reduce(_ || _)
    val joined = p.join(c, keys, "full_outer")
      .withColumn("diff_status",
        when(col("__in_prev").isNull, "added")
          .when(col("__in_cur").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
    compareCols.foldLeft(joined) { case (df, cc) =>
      df.withColumn(s"${cc}_prev", col("__pc").getField(cc))
        .withColumn(s"${cc}_cur", col("__cc").getField(cc))
    }.drop("__in_prev", "__in_cur", "__pc", "__cc")
  }
}
