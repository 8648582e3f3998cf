package graft

import graft.etl.{IncrementalAgg, Load}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: after any upsert sequence, the
  * incrementally-folded rollup must equal a full recompute of the
  * final fact table — including groups that appear, change, and
  * vanish along the way.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val dims = Seq("cat")
  private val vals = Seq("qty")

  private def batch(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "cat", "qty")

  private def sortedRows(df: DataFrame) =
    df.select("cat", "n", "sum_qty").orderBy("cat")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("folded deltas track a full upsert sequence exactly") {
    val t = tmpDir("iagg") + "/fact"
    val batches = Seq(
      batch((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L)),
      // replaces id=2 (a→b move), adds a new group c
      batch((2L, "b", 9L), (4L, "c", 1L)),
      // replaces id=3 and id=4; group c vanishes (its only row moves)
      batch((3L, "b", 8L), (4L, "a", 2L)),
      // replaces everything in group b
      batch((2L, "a", 9L), (3L, "a", 8L)))
    var agg: DataFrame = IncrementalAgg.recompute(
      batch().limit(0), dims, vals)
    batches.foreach { b =>
      // materialize the before/after snapshots — the next upsert
      // replaces the files a lazy plan would re-read
      val before = (if (new java.io.File(t).exists())
        spark.read.parquet(t).join(b.select("id"), Seq("id"), "left_semi")
          .select("id", "cat", "qty")
      else b.limit(0)).localCheckpoint(true)
      Load.upsert(spark, b, t, Seq("id"))
      val after = spark.read.parquet(t)
        .join(b.select("id"), Seq("id"), "left_semi")
        .select("id", "cat", "qty").localCheckpoint(true)
      agg = IncrementalAgg.applyDelta(agg,
        IncrementalAgg.delta(before, after, dims, vals), dims, vals)
        .localCheckpoint(true)
    }
    val expected = IncrementalAgg.recompute(
      spark.read.parquet(t).select("id", "cat", "qty"), dims, vals)
    assert(sortedRows(agg) === sortedRows(expected))
    // the final state: a has ids 1,2,3,4 → n=4; b and c are gone
    assert(sortedRows(agg) === Seq(("a", 4L, 29L)))
  }

  test("vanished groups leave no zero-count residue") {
    val start = batch((1L, "x", 3L), (2L, "y", 4L))
    val agg0 = IncrementalAgg.recompute(start, dims, vals)
    // both y-rows replaced by x-rows
    val old = batch((2L, "y", 4L))
    val neu = batch((2L, "x", 4L))
    val agg1 = IncrementalAgg.applyDelta(agg0,
      IncrementalAgg.delta(old, neu, dims, vals), dims, vals)
    assert(sortedRows(agg1) === Seq(("x", 2L, 7L)))
  }

  test("delta on empty sides is a no-op") {
    val base = batch((1L, "x", 3L))
    val agg0 = IncrementalAgg.recompute(base, dims, vals)
    val empty = base.limit(0)
    val agg1 = IncrementalAgg.applyDelta(agg0,
      IncrementalAgg.delta(empty, empty, dims, vals), dims, vals)
    assert(sortedRows(agg1) === sortedRows(agg0))
  }
}
