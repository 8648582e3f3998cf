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

  test("partition-dir layouts: stats carry partition values; skipping subsumes partition pruning") {
    val d = tmpDir("dsk_part")
    // Hive-style tree: day=…/file.parquet — the real ingest layout
    val df = (1L to 900L).map(i => (i, (i - 1) / 300 + 1, i % 5)).toDF("k", "day", "g")
    df.write.partitionBy("day").parquet(s"$d/t")
    val stats = StatsIndex.build(spark, s"$d/t", Seq("day", "k"))
    // partition column stats: min = max = the partition value per file
    assert(stats.filter(col("min_day") =!= col("max_day")).count() === 0L)
    // pruning on the PARTITION column from file stats alone
    val (byDay, nRead, nTotal) = StatsIndex.prunedRead(
      spark, s"$d/t", stats, "day", Some(lit(2L)), Some(lit(2L)))
    assert(byDay.select("k").as[Long].collect().sorted === (301L to 600L).toArray)
    assert(nRead < nTotal)
    // partition columns survive the subset read (basePath)
    assert(byDay.columns.contains("day"))
    // and composes with in-file ranges on a data column
    val (byK, kRead, _) = StatsIndex.prunedRead(
      spark, s"$d/t", stats, "k", Some(lit(850L)), None)
    assert(byK.select("k").as[Long].collect().sorted === (850L to 900L).toArray)
    assert(kRead < nTotal)
  }

  test("updateFor under partitions: mixed append + delete, stats stay exact") {
    val d = tmpDir("dsk_part_upd")
    val base = (1L to 600L).map(i => (i, (i - 1) / 300 + 1)).toDF("k", "day")
    base.write.partitionBy("day").parquet(s"$d/t")
    val v1 = StatsIndex.build(spark, s"$d/t", Seq("day", "k")).cache()
    v1.count()
    // append a NEW partition and delete a file from an old one
    (601L to 700L).map(i => (i, 3L)).toDF("k", "day")
      .write.mode("append").partitionBy("day").parquet(s"$d/t")
    val victim = new java.io.File(s"$d/t/day=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val victimRows = spark.read.parquet(victim.getPath).count()
    assert(victim.delete())
    spark.catalog.refreshByPath(s"$d/t") // external delete: drop the cached listing
    val v2 = StatsIndex.updateFor(spark, s"$d/t", v1, Seq("day", "k"))
    val scratch = StatsIndex.build(spark, s"$d/t", Seq("day", "k"))
    assert(v2.exceptAll(scratch).count() === 0L)
    assert(scratch.exceptAll(v2).count() === 0L)
    assert(v2.agg(sum("n_rows")).as[Long].head() === 700L - victimRows)
    // the new partition is reachable through a pruned read
    val (df3, nRead, _) = StatsIndex.prunedRead(
      spark, s"$d/t", v2, "day", Some(lit(3L)), Some(lit(3L)))
    assert(df3.select("k").as[Long].collect().sorted === (601L to 700L).toArray)
    assert(nRead >= 1)
    v1.unpersist()
  }

  test("'_'-prefixed partition dirs (__batch=) follow Spark's visibility rule") {
    // Spark treats a '_'-prefixed path component as hidden ONLY when
    // it has no '=' — `__batch=0/` is a legal partition dir (the
    // engine's own quarantine/upsert sinks write such layouts). The
    // listing inside updateFor must agree with what spark.read scans,
    // or the survivor semi-join silently drops every stats row.
    val d = tmpDir("dsk_batch")
    (1L to 300L).map(i => (i, i % 3)).toDF("k", "__batch")
      .write.partitionBy("__batch").parquet(s"$d/t")
    val v1 = StatsIndex.build(spark, s"$d/t", Seq("k")).cache()
    assert(v1.count() > 0)
    (301L to 400L).map(i => (i, 3L)).toDF("k", "__batch")
      .write.mode("append").partitionBy("__batch").parquet(s"$d/t")
    val v2 = StatsIndex.updateFor(spark, s"$d/t", v1, Seq("k"))
    // regression: the old '_'-is-always-hidden rule emptied the index
    assert(v1.exceptAll(v2).count() === 0L, "survivor rows dropped")
    val scratch = StatsIndex.build(spark, s"$d/t", Seq("k"))
    assert(v2.exceptAll(scratch).count() === 0L)
    assert(scratch.exceptAll(v2).count() === 0L)
    val (df, nRead, nTotal) = StatsIndex.prunedRead(
      spark, s"$d/t", v2, "k", Some(lit(350L)), None)
    assert(df.select("k").as[Long].collect().sorted === (350L to 400L).toArray)
    assert(nRead > 0 && nRead < nTotal)
    v1.unpersist()
  }

  test("updateFor diffs via joins — no plan-literal isin at thousands of files") {
    val d = tmpDir("dsk_many")
    // 400 files: enough that a literal In-expression would be blatant
    (1L to 2000L).toDF("k").repartition(400)
      .write.parquet(s"$d/t")
    val v1 = StatsIndex.build(spark, s"$d/t", Seq("k")).cache()
    v1.count()
    (2001L to 2100L).toDF("k").repartition(2)
      .write.mode("append").parquet(s"$d/t")
    val v2 = StatsIndex.updateFor(spark, s"$d/t", v1, Seq("k"))
    // the survivor filter must be a semi JOIN against the listing
    // frame, not a driver-built isin over every known file
    val plan = v2.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("IN ("), "survivor filter regressed to a literal In")
    assert(v2.count() === 402L)
    assert(v2.agg(sum("n_rows")).as[Long].head() === 2100L)
    v1.unpersist()
  }

  test("streaming stats-indexed ingest: 3-batch run equals 1-shot; stats equal a rebuild") {
    import graft.streaming.Ingest
    val rows = (1L to 900L).map(i => (i, i % 7)).toDF("k", "g")
    def run(slices: Seq[org.apache.spark.sql.DataFrame], tag: String) = {
      val d = tmpDir(s"dsk_stream_$tag")
      Ingest.stageOrderedParquet(spark, slices, s"$d/staging")
      Ingest.statsIndexedIngestAvailableNow(spark, s"$d/staging", s"$d/chk",
        s"$d/t", s"$d/stats", Seq("k"), "k LONG, g LONG",
        maxFilesPerTrigger = Some(1))
      d
    }
    val d3 = run(Seq(
      rows.filter(col("k") <= 300L),
      rows.filter(col("k") > 300L && col("k") <= 600L),
      rows.filter(col("k") > 600L)), "a")
    val d1 = run(Seq(rows), "b")
    // data content identical under any slicing (batch_id aside)
    val a = spark.read.parquet(s"$d3/t").select("k", "g")
    val b = spark.read.parquet(s"$d1/t").select("k", "g")
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
    // the incrementally-maintained stats are row-identical to a
    // from-scratch rebuild of the final table
    val stats3 = Load.readTable(spark, s"$d3/stats")
    val rebuild = StatsIndex.build(spark, s"$d3/t", Seq("k"))
    assert(stats3.exceptAll(rebuild).count() === 0L)
    assert(rebuild.exceptAll(stats3).count() === 0L)
    // and the stream-maintained index prunes across batch partitions
    val (df, nRead, nTotal) = StatsIndex.prunedRead(
      spark, s"$d3/t", stats3, "k", Some(lit(301L)), Some(lit(600L)))
    assert(df.select("k").as[Long].collect().sorted === (301L to 600L).toArray)
    assert(nRead < nTotal)
  }

  test("multi-column box prune over a z-ordered layout: exact, and tighter than one dimension") {
    val d = tmpDir("dsk_z")
    // two independent uniform dims — the case z-order exists for
    val df = (1L to 20000L).map(i => (i % 141, (i * 7919) % 137, i))
      .toDF("x", "y", "id")
    graft.etl.ZOrder.writeZOrdered(spark, df, Seq("x", "y"),
      bits = 8, numFiles = 16, s"$d/t")
    val stats = StatsIndex.build(spark, s"$d/t", Seq("x", "y"))
    val box = Seq(
      ("x", Some(lit(10L)), Some(lit(40L))),
      ("y", Some(lit(10L)), Some(lit(40L))))
    val (pruned, nRead, nTotal) = StatsIndex.prunedReadMulti(
      spark, s"$d/t", stats, box)
    // exactness: the pruned read equals the full filter
    val expect = df.filter(col("x").between(10L, 40L) &&
      col("y").between(10L, 40L)).select("id").as[Long].collect().sorted
    assert(pruned.select("id").as[Long].collect().sorted === expect)
    assert(expect.nonEmpty)
    // the box intersection prunes, and never opens MORE files than
    // either single dimension alone
    val xOnly = StatsIndex.candidateFiles(stats, "x", Some(lit(10L)), Some(lit(40L))).size
    val yOnly = StatsIndex.candidateFiles(stats, "y", Some(lit(10L)), Some(lit(40L))).size
    assert(nRead < nTotal, s"box read $nRead of $nTotal")
    assert(nRead <= math.min(xOnly, yOnly))
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

  // --- per-file Bloom index: point lookups min/max can't serve ---

  /** Layout clustered by `t` so `k` is SPREAD across every file —
    * min/max on k prunes nothing, the Bloom must.
    */
  private lazy val bloomDir: String = {
    val d = tmpDir("blm")
    // k = EVEN permutation values spread over t-order: each file's
    // k-slice spans ~the full k range (min/max can't prune a point),
    // and every in-range ODD value is genuinely absent (the case the
    // bloom must prune WITHOUT min/max help)
    val df = (1L to 2000L).map(i => (i, ((i * 997L) % 2000L) * 2L))
      .toDF("t", "k")
    Load.writeClustered(spark, df, "t", 16, s"$d/t")
    s"$d/t"
  }

  test("bloom point lookup: exact rows, prunes far below min/max candidates") {
    val stats = StatsIndex.build(spark, bloomDir, Seq("t", "k"))
    val bloom = StatsIndex.buildBloom(spark, bloomDir, "k",
      expectedItemsPerFile = 1L << 10)
    val (df, nRead, nMinMax, nTotal) = StatsIndex.prunedReadPoint(
      spark, bloomDir, stats, bloom, "k", 1994L)
    // value correctness: identical to the full filter
    assert(df.select("t").as[Long].collect() === Array(1L))
    // the t-clustered layout spreads k: min/max opens (nearly) all
    // files, the bloom opens ~the one containing k=997
    assert(nMinMax > nTotal / 2, s"minmax candidates $nMinMax of $nTotal")
    assert(nRead < nMinMax / 2, s"bloom read $nRead vs minmax $nMinMax")
    assert(nRead >= 1)
  }

  test("bloom probe for an ABSENT key opens ~no files; never drops true rows") {
    val stats = StatsIndex.build(spark, bloomDir, Seq("k"))
    val bloom = StatsIndex.buildBloom(spark, bloomDir, "k",
      expectedItemsPerFile = 1L << 10)
    // 1995 is INSIDE every file's [min,max] (odd ⇒ absent) — only
    // the bloom can rule the files out
    val (df, nRead, nMinMax, nTotal) = StatsIndex.prunedReadPoint(
      spark, bloomDir, stats, bloom, "k", 1995L)
    assert(df.count() === 0L)
    assert(nMinMax > nTotal / 2, s"minmax candidates $nMinMax of $nTotal")
    // fpp=0.001 over 16 files: essentially always 0, never many
    assert(nRead <= 2, s"absent key opened $nRead of $nTotal files")
    // exhaustive no-false-negative check: every present key's pruned
    // read finds all its rows
    val present = Seq(2L, 1000L, 2468L, 3998L)
    present.foreach { v =>
      val (pdf, _, _, _) = StatsIndex.prunedReadPoint(
        spark, bloomDir, stats, bloom, "k", v)
      val want = spark.read.parquet(bloomDir)
        .filter(col("k") === v).count()
      assert(pdf.count() === want, s"k=$v")
    }
  }

  test("a file missing from the bloom table is kept conservatively") {
    val stats = StatsIndex.build(spark, bloomDir, Seq("k"))
    val bloom = StatsIndex.buildBloom(spark, bloomDir, "k",
      expectedItemsPerFile = 1L << 10)
    val crippled = bloom.limit(4)
    val (df, nRead, _, _) = StatsIndex.prunedReadPoint(
      spark, bloomDir, stats, crippled, "k", 1994L)
    assert(df.select("t").as[Long].collect() === Array(1L))
    // files without a sketch row can't be ruled out — they stay open
    assert(nRead >= 16 - 4, s"read $nRead")
  }
}
