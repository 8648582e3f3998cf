package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: replay an upsert/delete change log
  * into a table snapshot — the general form of the reference's
  * upsert sink (`main.py:50` has no delete path; real CDC feeds
  * do). The version axis is explicit (`orderCols`), so late or
  * out-of-order change rows resolve correctly: per key, the
  * highest-version operation wins, and a winning delete tombstone
  * removes the key.
  *
  * Two forms:
  *  - [[state]]: full-log replay → resolved per-key state WITH
  *    tombstone rows kept (one window shuffle on the key — never a
  *    driver collect; `WindowGroupLimit` pushes the rank-1 cut
  *    below the exchange);
  *  - [[mergeBatch]]: incremental — fold a new batch into retained
  *    state. Because state keeps tombstones (with their versions), a
  *    late change older than a delete cannot resurrect the key, and
  *    folding ANY partition of the log, in any batch order, equals
  *    the one-shot replay (CdcSpec proves the invariant on random
  *    splits). This is what a 100 TB pipeline runs: per micro-batch
  *    cost is O(|state keys touched| + |batch|), not O(|log|).
  *
  * [[snapshot]] projects live rows (tombstones filtered, bookkeeping
  * dropped) for consumers.
  */
object Cdc {

  /** Resolved per-key state including tombstones: the latest
    * (by `orderCols`, descending, per `keyCols`) change row per key.
    *
    * `orderCols` should totally order a key's changes (CDC feeds
    * carry a position/LSN that does); if a feed nonetheless delivers
    * two changes with EQUAL versions, the tie breaks
    * deterministically over the remaining columns (sorted by name,
    * descending) — an arbitrary row_number pick would make the
    * incremental fold depend on how the log was batched, silently
    * breaking the fold == one-shot-replay invariant on conflicted
    * feeds.
    */
  def state(log: DataFrame, keyCols: Seq[String],
            orderCols: Seq[String]): DataFrame = {
    val tieCols = log.columns.toSeq
      .filterNot((keyCols ++ orderCols).contains).sorted
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((orderCols ++ tieCols).map(col(_).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Live rows of a resolved state: tombstones out, op column out. */
  def snapshot(resolved: DataFrame, opCol: String,
               deleteOp: String): DataFrame =
    resolved.filter(col(opCol) =!= deleteOp).drop(opCol)

  /** Fold one change batch into retained state (schemas must match;
    * both carry `opCol` + `orderCols`). Equivalent to replaying the
    * concatenated log, for any split of the log into batches.
    */
  def mergeBatch(resolved: DataFrame, batch: DataFrame,
                 keyCols: Seq[String], orderCols: Seq[String]): DataFrame =
    state(resolved.unionByName(batch), keyCols, orderCols)
}
