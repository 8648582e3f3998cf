package graft

import org.apache.spark.sql.functions._
import graft.etl.{Load, StatsIndex}

/** File-level data-skipping index: stats correctness, conservative
  * pruning (never a false negative), null-stats files always kept,
  * empty-candidate degenerate path.
  */
class StatsIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dataDir: String = {
    val d = tmpDir("dsk")
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "g")
    Load.writeClustered(spark, df, "k", 10, s"$d/t")
    s"$d/t"
  }

  test("one stats row per file; mins/maxes cover the data exactly") {
    val stats = StatsIndex.build(spark, dataDir, Seq("k"))
    val files = spark.read.parquet(dataDir).select(input_file_name())
      .distinct().count()
    assert(stats.count() === files)
    val (lo, hi, n) = stats
      .agg(min("min_k"), max("max_k"), sum("n_rows"))
      .as[(Long, Long, Long)].head()
    assert((lo, hi, n) === (1L, 1000L, 1000L))
    // clustered write ⇒ per-file ranges are disjoint (the layout
    // the index is designed to exploit)
    val ranges = stats.select("min_k", "max_k").as[(Long, Long)]
      .collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aHi), (bLo, _)) => assert(aHi < bLo)
      case _ =>
    }
  }

  test("pruned read equals full filter (no false negatives), and prunes") {
    val stats = StatsIndex.build(spark, dataDir, Seq("k"))
    val (df, nRead, nTotal) = StatsIndex.prunedRead(
      spark, dataDir, stats, "k", Some(lit(250L)), Some(lit(400L)))
    val got = df.select("k").as[Long].collect().sorted
    assert(got === (250L to 400L).toArray)
    assert(nRead < nTotal, s"expected pruning, read $nRead of $nTotal")
    assert(nRead > 0)
  }

  test("open-ended bounds work; missing bound keeps the other side") {
    val stats = StatsIndex.build(spark, dataDir, Seq("k"))
    val (ge, nr, _) = StatsIndex.prunedRead(
      spark, dataDir, stats, "k", Some(lit(900L)), None)
    assert(ge.count() === 101L)
    assert(nr > 0)
    val (le, _, _) = StatsIndex.prunedRead(
      spark, dataDir, stats, "k", None, Some(lit(100L)))
    assert(le.count() === 100L)
  }

  test("an empty candidate set returns a schema-preserving empty frame") {
    val stats = StatsIndex.build(spark, dataDir, Seq("k"))
    val (df, nRead, _) = StatsIndex.prunedRead(
      spark, dataDir, stats, "k", Some(lit(5000L)), Some(lit(6000L)))
    assert(nRead === 0)
    assert(df.count() === 0L)
    assert(df.columns.toSeq === Seq("k", "g"))
  }

  test("updateFor scans only appended files and drops deleted ones") {
    val d = tmpDir("dsk_upd")
    Load.writeClustered(spark,
      (1L to 500L).toDF("k"), "k", 5, s"$d/t")
    val v1 = StatsIndex.build(spark, s"$d/t", Seq("k")).cache()
    v1.count()
    (501L to 600L).toDF("k").repartition(2)
      .write.mode("append").parquet(s"$d/t")
    val v2 = StatsIndex.updateFor(spark, s"$d/t", v1, Seq("k"))
    // all v1 rows preserved verbatim; exactly 2 fresh rows added,
    // and they equal a from-scratch build's rows for those files
    assert(v2.count() === 7L)
    assert(v1.exceptAll(v2).count() === 0L)
    val scratch = StatsIndex.build(spark, s"$d/t", Seq("k"))
    assert(v2.exceptAll(scratch).count() === 0L)
    assert(scratch.exceptAll(v2).count() === 0L)
    // a pruned read over the updated stats sees appended data
    val (df, nRead, nTotal) = StatsIndex.prunedRead(
      spark, s"$d/t", v2, "k", Some(lit(550L)), None)
    assert(df.count() === 51L)
    assert(nTotal === 7 && nRead <= 2)
    // deleting a file drops its stats row on the next update
    val gone = new java.io.File(s"$d/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(gone.delete())
    val v3 = StatsIndex.updateFor(spark, s"$d/t", v2, Seq("k"))
    assert(v3.count() === 6L)
  }

  test("files whose stats column is all-null are always kept") {
    val d = tmpDir("dsk_null")
    val withNulls = (1L to 100L)
      .map(i => (i, if (i <= 50) Some(i) else None)).toDF("id", "v")
    // cluster on id so the all-null-v rows concentrate in files
    Load.writeClustered(spark, withNulls, "id", 4, s"$d/t")
    val stats = StatsIndex.build(spark, s"$d/t", Seq("v"))
    assert(stats.filter(col("min_v").isNull).count() >= 1)
    val (df, _, _) = StatsIndex.prunedRead(
      spark, s"$d/t", stats, "v", Some(lit(10L)), Some(lit(20L)))
    assert(df.select("v").as[Option[Long]].collect().flatten.sorted
      === (10L to 20L).toArray)
  }
}
