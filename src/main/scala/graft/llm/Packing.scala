package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * shards in a deterministic global order — the step that turns a
  * filtered/deduped/mixed corpus into the contiguous ~N-token chunks
  * a pretraining loader consumes.
  *
  * The naive formulation is a single `Window.orderBy(id)` cumulative
  * sum — which moves the WHOLE corpus through one partition and dies
  * at scale. This implementation is the distributed two-pass prefix
  * sum instead (the same trick as RDD.zipWithIndex):
  *
  *   1. range-partition by id — each partition owns a contiguous id
  *      range;
  *   2. aggregate per-partition token totals: one tiny row per
  *      partition, collected to the driver (bounded by the partition
  *      count, like the bucket-id collect in `etl/Load`);
  *   3. broadcast the exclusive per-partition offsets back and add
  *      them to a PER-PARTITION cumulative-sum window — every window
  *      runs in parallel, no single-partition stage.
  *
  * The result is a pure function of (id order, token counts): any
  * contiguous range split produces identical global offsets, so the
  * partition count never changes the output (asserted in
  * PackingSpec).
  */
object Packing {

  /** Per-doc global start offset (tokens before this doc in id
    * order) and shard assignment `start div budget`.
    * Output: (idCol, tok, start, shard).
    *
    * Precondition: ids are unique (they order the global token
    * layout); duplicate ids have no defined packing order.
    */
  def packShards(docs: DataFrame, idCol: String, tokExpr: Column,
                 budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = docs.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    // The frame feeds two jobs (per-partition totals, then the main
    // windowed pass); the barrier cache pins ONE materialization so
    // spark_partition_id() is read from the same physical layout in
    // both.
    val d = BarrierCache.track(
      docs.select(col(idCol), tokExpr.cast("long").as("tok"))
        .repartitionByRange(parts, col(idCol))
        .withColumn("__pid", spark_partition_id()))
    val totals = d.groupBy("__pid").agg(sum("tok").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
    val exclusive = totals.map(_._1).zip(offsets.map(_._2)).toMap
    val offDf = spark.createDataFrame(
      exclusive.toSeq.map { case (pid, off) => (pid, off) })
      .toDF("__pid", "__off")
    // ROWS frame, not the orderBy default RANGE: RANGE sums all
    // ORDER-BY peers, so duplicate ids would double-count into every
    // tied row's offset. Ids are required unique (doc ids are); with
    // ROWS the frame matches the oracle's cumsum exactly.
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offDf), Seq("__pid"))
      .withColumn("start", sum("tok").over(w) + col("__off") - col("tok"))
      .withColumn("shard", expr(s"start div ${budget}L"))
      .select(col(idCol), col("tok"), col("start"), col("shard"))
  }
}
