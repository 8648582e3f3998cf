package graft

import graft.llm.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the distributed two-pass prefix sum must equal
  * the single-window cumsum for ANY partition count.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col("doc_id"),
        (sum(size(split(col("text"), " "))).over(w) - size(split(col("text"), " "))).cast("long").as("start"))
      .withColumn("shard", expr("start div 100"))
      .select("doc_id", "start", "shard")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("matches the single-window cumsum at several partition counts") {
    graft.llm.BarrierCache.sweep(spark)
    val docs = Tables.documents(spark, sf)
    val expect = naive(docs)
    for (p <- Seq(1, 3, 32)) {
      val got = Packing.packShards(docs, "doc_id",
          size(split(col("text"), " ")), budget = 100L, numParts = p)
        .select("doc_id", "start", "shard")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got === expect, s"partition count $p diverged")
      graft.llm.BarrierCache.sweep(spark)
    }
  }

  test("a doc starting exactly on the budget boundary opens the next shard") {
    val df = Seq((1L, "a b c"), (2L, "d e f"), (3L, "g")).toDF("doc_id", "text")
    val got = Packing.packShards(df, "doc_id", size(split(col("text"), " ")), budget = 3L)
      .select("doc_id", "start", "shard").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 0L, 0L), (2L, 3L, 1L), (3L, 6L, 2L)))
    graft.llm.BarrierCache.sweep(spark)
  }

  test("packing invariants: totals preserved, shard fill bounded") {
    graft.llm.BarrierCache.sweep(spark)
    val docs = Tables.documents(spark, sf)
    val budget = 2000L
    val packed = Packing.packShards(docs, "doc_id",
      size(split(col("text"), " ")), budget)
    val stats = packed.groupBy("shard")
      .agg(sum("tok").as("t"), max("tok").as("mx"), min("start").as("lo"))
      .collect()
    // every token is packed exactly once
    val total = stats.map(_.getLong(1)).sum
    assert(total === docs.select(sum(size(split(col("text"), " ")))).head().getLong(0))
    // a shard never exceeds budget by more than one document's tail
    // (docs are atomic: the one straddling the boundary overflows)
    stats.foreach { r =>
      assert(r.getLong(1) <= budget + r.getLong(2), r.toString)
    }
    // shard ids are dense from 0
    val ids = stats.map(_.get(0).toString.toLong).sorted
    assert(ids === (0L until ids.length).toArray)
    graft.llm.BarrierCache.sweep(spark)
  }

  test("empty input packs to nothing") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Packing.packShards(df, "doc_id", size(split(col("text"), " ")), 10L).isEmpty)
    graft.llm.BarrierCache.sweep(spark)
  }

  test("no single-partition exchange in the plan") {
    graft.llm.BarrierCache.sweep(spark)
    val plan = Packing.packShards(Tables.documents(spark, sf), "doc_id",
        size(split(col("text"), " ")), budget = 4096L)
      .queryExecution.executedPlan.toString
    // the naive formulation shows as 'Window [...]' under a
    // SinglePartition exchange; ours must partition the window by __pid
    assert(!plan.contains("SinglePartition"), plan.take(3000))
    graft.llm.BarrierCache.sweep(spark)
  }
}
