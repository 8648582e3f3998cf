package graft

import graft.etl.Snapshots
import org.apache.spark.sql.functions._

/** Versioned snapshots + time travel (etl/Snapshots): commit
  * protocol, historical reads, metadata-only rollback, vacuum
  * retention, and crash-orphan invisibility.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int) = (1 to n).map(i => (i.toLong, s"r$i")).toDF("id", "s")

  test("commit/read round-trip; versions increment; latest wins") {
    val root = tmpDir("snap_rt")
    assert(Snapshots.versions(spark, root).isEmpty)
    assert(Snapshots.commit(spark, df(3), root) === 1L)
    assert(Snapshots.commit(spark, df(5), root) === 2L)
    assert(Snapshots.versions(spark, root) === Seq(1L, 2L))
    assert(Snapshots.read(spark, root).count() === 5)
  }

  test("time travel: old versions stay readable bit-for-bit after later commits") {
    val root = tmpDir("snap_tt")
    Snapshots.commit(spark, df(3), root)
    Snapshots.commit(spark, df(3).withColumn("s", upper(col("s"))), root)
    val v1 = Snapshots.read(spark, root, Some(1L)).orderBy("id")
      .as[(Long, String)].collect()
    assert(v1 === Array((1L, "r1"), (2L, "r2"), (3L, "r3")))
    val v2 = Snapshots.read(spark, root, Some(2L)).orderBy("id")
      .as[(Long, String)].collect()
    assert(v2 === Array((1L, "R1"), (2L, "R2"), (3L, "R3")))
  }

  test("rollback is metadata-only and append-only") {
    val root = tmpDir("snap_rb")
    Snapshots.commit(spark, df(3), root)
    Snapshots.commit(spark, df(9), root) // the "bad" version
    val v3 = Snapshots.rollback(spark, root, to = 1L)
    assert(v3 === 3L)
    assert(Snapshots.read(spark, root).count() === 3)
    // the bad version remains inspectable
    assert(Snapshots.read(spark, root, Some(2L)).count() === 9)
    // no data was copied: still exactly two data dirs (v3 points at
    // v1's), and v3's version file references an existing dir
    val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName)
    assert(dataDirs.length === 2, dataDirs.mkString(","))
  }

  test("a crashed commit's orphan data dir is invisible and vacuumable") {
    val root = tmpDir("snap_crash")
    Snapshots.commit(spark, df(3), root)
    // simulate a crash: data fully written, version file never published
    df(7).write.parquet(s"$root/data/v2")
    assert(Snapshots.latestVersion(spark, root) === Some(1L))
    assert(Snapshots.read(spark, root).count() === 3)
    Snapshots.vacuum(spark, root, keepLast = 5, orphanGraceMs = 0)
    assert(!new java.io.File(s"$root/data/v2").exists(), "orphan not reclaimed")
    assert(Snapshots.read(spark, root).count() === 3)
  }

  test("vacuum keeps rollback-target data alive while dropping old versions") {
    val root = tmpDir("snap_vac")
    Snapshots.commit(spark, df(2), root)  // v1
    Snapshots.commit(spark, df(4), root)  // v2
    Snapshots.rollback(spark, root, 1L)   // v3 -> data/v1
    Snapshots.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0)
    // only v3 survives, and it still reads v1's data
    assert(Snapshots.versions(spark, root) === Seq(3L))
    assert(Snapshots.read(spark, root).count() === 2)
    // v2's now-unreferenced data dir is gone; exactly the one dir
    // v3 references (v1's data) survives
    val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName)
    assert(dataDirs.length === 1, dataDirs.mkString(","))
  }

  test("concurrent commits all land as distinct versions with intact data") {
    // the optimistic-concurrency contract: N racing writers never
    // overwrite each other's data (unique dirs) and each lands as
    // SOME version (publish-race retry) — the multi-writer reality
    // of a shared 100 TB table
    val root = tmpDir("snap_occ")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try versions.add(Snapshots.commit(spark, df(i * 10), root))
        catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"commit failed: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val vs = versions.asScala.toSeq.sorted
    assert(vs === Seq(1L, 2L, 3L, 4L), s"versions $vs")
    // every committed version reads back one of the written frames,
    // complete — no torn or cross-written data
    val sizes = vs.map(v => Snapshots.read(spark, root, Some(v)).count()).sorted
    assert(sizes === Seq(10L, 20L, 30L, 40L), s"row counts $sizes")
  }

  test("hammered publish races: every publish wins a DISTINCT version, none lost") {
    // rollbacks are metadata-only, so 40 of them from 8 threads hit
    // the publish step nearly simultaneously — the local FS's
    // rename(2) silently REPLACES an existing destination, so a
    // rename-based commit point would let two publishers both claim
    // the same version number (one commit silently lost); the
    // link(2) create-exclusive promote must never do that
    val root = tmpDir("snap_race")
    Snapshots.commit(spark, df(3), root)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try {
          barrier.await()
          (1 to 5).foreach(_ => got.add(Snapshots.rollback(spark, root, to = 1L)))
        } catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"publish failed: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val vs = got.asScala.toSeq.sorted
    assert(vs === (2L to 41L), s"publish races lost or duplicated a version: $vs")
    assert(Snapshots.versions(spark, root) === (1L to 41L))
  }

  test("commit is exactly the write job; rollback runs zero jobs") {
    val root = tmpDir("snap_jobs")
    def jobsIn(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // the status store is fed asynchronously — poll until stable
      var last = -1
      var n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while (n != last && spins < 50) {
        last = n; Thread.sleep(100)
        n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        spins += 1
      }
      n
    }
    assert(jobsIn("snap_commit_probe") {
      Snapshots.commit(spark, df(4), root)
    } === 1, "commit must run ONLY the write — n_rows rides the write via observe")
    assert(jobsIn("snap_rollback_probe") {
      Snapshots.rollback(spark, root, to = 1L)
    } === 0, "rollback must be metadata-only — no data read for n_rows")
    // and the observed n_rows landed in the version metadata
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_versions/v00000001.json")), "UTF-8")
    assert(body.contains("\"n_rows\":4"), body)
  }

  test("commitWithStats: time travel prunes; rollback reuses its index; vacuum reclaims stats") {
    import spark.implicits._
    val root = tmpDir("snap_skip")
    def clustered(df: org.apache.spark.sql.DataFrame) =
      df.repartitionByRange(4, col("id")).sortWithinPartitions("id")
    val v1 = Snapshots.commitWithStats(spark,
      clustered((1L to 400L).map(i => (i, s"a$i")).toDF("id", "s")),
      root, Seq("id"))
    val v2 = Snapshots.commitWithStats(spark,
      clustered((1L to 800L).map(i => (i, s"b$i")).toDF("id", "s")),
      root, Seq("id"))
    // historical version prunes from ITS OWN index
    val (r1, n1, t1) = Snapshots.readPruned(
      spark, root, Some(v1), "id", Some(lit(50L)), Some(lit(60L)))
    assert(r1.select("id").as[Long].collect().sorted === (50L to 60L).toArray)
    assert(n1 > 0 && n1 < t1, s"v1 read $n1 of $t1 files")
    // latest prunes too
    val (r2, n2, t2) = Snapshots.readPruned(
      spark, root, None, "id", Some(lit(700L)), None)
    assert(r2.count() === 101L)
    assert(n2 > 0 && n2 < t2)
    // metadata-only rollback: the re-pointed version serves the SAME
    // pruned read from v1's already-built index — zero stats work
    val v3 = Snapshots.rollback(spark, root, v1)
    val (r3, n3, t3) = Snapshots.readPruned(
      spark, root, Some(v3), "id", Some(lit(50L)), Some(lit(60L)))
    assert(r3.count() === 11L)
    assert((n3, t3) === ((n1, t1)))
    // vacuum drops a reclaimed dir's stats alongside its data
    Snapshots.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0) // keeps v3 → v1's dir
    val statsDirs = new java.io.File(s"$root/_stats").listFiles().map(_.getName)
    assert(statsDirs.length === 1, s"v$v2's stats survived vacuum: ${statsDirs.mkString(",")}")
    assert(Snapshots.readPruned(spark, root, None, "id",
      Some(lit(50L)), Some(lit(60L)))._1.count() === 11L)
  }

  test("optimize compacts latest into a new version; data identical, history intact") {
    import spark.implicits._
    val root = tmpDir("snap_opt")
    val v1 = Snapshots.commitWithStats(spark,
      (1L to 500L).map(i => (i, s"r$i")).toDF("id", "s").repartition(20),
      root, Seq("id"))
    def nFiles(v: Long) = Snapshots.read(spark, root, Some(v))
      .select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    assert(nFiles(v1) === 20L)
    val v2 = Snapshots.optimize(spark, root,
      targetBytes = 1L << 30, statsCols = Seq("id"))
    assert(v2 === v1 + 1)
    assert(nFiles(v2) === 1L)
    // bit-identical data, both directions
    val a = Snapshots.read(spark, root, Some(v1))
    val b = Snapshots.read(spark, root, Some(v2))
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
    // the small-file layout stays time-travel readable, and the
    // compacted version serves pruned reads from its own index
    assert(nFiles(v1) === 20L)
    val (pr, nRead, nTotal) = Snapshots.readPruned(
      spark, root, None, "id", Some(lit(10L)), Some(lit(20L)))
    assert(pr.count() === 11L)
    assert(nRead === 1 && nTotal === 1)
    // vacuum later reclaims the pre-optimize layout
    Snapshots.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0)
    assert(Snapshots.versions(spark, root) === Seq(v2))
    assert(Snapshots.read(spark, root).count() === 500L)
  }

  test("optimize never shadows a concurrent commit (conflict-checked publish)") {
    // optimize's output is a function of the version it READ, so its
    // publish must lose to any commit that lands after the read — the
    // invariant under any interleaving: an optimize-published version
    // is data-identical to its IMMEDIATE predecessor, and every
    // concurrent commit's own version still reads its full frame
    val root = tmpDir("snap_opt_occ")
    Snapshots.commit(spark, df(5).repartition(4), root)
    val optVs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val commitVs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val committer = new Thread(() =>
      try {
        barrier.await()
        (1 to 3).foreach(i =>
          commitVs.add(Snapshots.commit(spark, df(i * 10).repartition(4), root)))
      } catch { case t: Throwable => errors.add(t) })
    val optimizer = new Thread(() =>
      try {
        barrier.await()
        (1 to 3).foreach(_ =>
          optVs.add(Snapshots.optimize(spark, root, targetBytes = 1L << 30)))
      } catch { case t: Throwable => errors.add(t) })
    committer.start(); optimizer.start()
    committer.join(180000); optimizer.join(180000)
    assert(errors.isEmpty, s"failed: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    optVs.asScala.foreach { v =>
      val prev = Snapshots.read(spark, root, Some(v - 1))
      val opt = Snapshots.read(spark, root, Some(v))
      assert(prev.exceptAll(opt).count() === 0L &&
        opt.exceptAll(prev).count() === 0L,
        s"optimize v$v is not a compaction of v${v - 1} — a commit was shadowed")
    }
    val sizes = commitVs.asScala.toSeq.sorted
      .map(v => Snapshots.read(spark, root, Some(v)).count())
    assert(sizes === Seq(10L, 20L, 30L))
  }

  test("a version file missing n_rows is rejected, not propagated as -1") {
    val root = tmpDir("snap_bad_meta")
    Snapshots.commit(spark, df(2), root)
    val p = java.nio.file.Paths.get(s"$root/_versions/v00000001.json")
    val body = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replaceAll(""","n_rows":\d+""", "")
    java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    intercept[IllegalStateException] { Snapshots.read(spark, root) }
    // rollback must refuse too — republishing would mint a version
    // file the reader regex can never parse
    intercept[IllegalStateException] { Snapshots.rollback(spark, root, 1L) }
  }

  // --- copy-on-write tier: append / merge / deleteRange ---

  private def kv(ids: Seq[Long], tagS: String) =
    ids.map(i => (i, s"$tagS$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")

  test("append is metadata-only: prior files referenced verbatim, batch-sized write") {
    val root = tmpDir("snap_app")
    val v1 = Snapshots.commitWithStats(spark, kv(1L to 400L, "a"), root, Seq("id"))
    val filesV1 = Snapshots.filesOfVersion(spark, root, v1).toSet
    val v2 = Snapshots.append(spark, kv(401L to 500L, "b"), root, Seq("id"))
    val filesV2 = Snapshots.filesOfVersion(spark, root, v2).toSet
    // every v1 file is carried BY REFERENCE — no rewrite, no copy
    assert(filesV1.subsetOf(filesV2), "append rewrote or dropped prior files")
    assert(filesV2.size > filesV1.size)
    assert(Snapshots.read(spark, root).count() === 500L)
    assert(Snapshots.read(spark, root, Some(v1)).count() === 400L)
    // n_rows in metadata is exact without any re-count job
    assert(Snapshots.versionMeta(spark, root, v2).nRows === 500L)
    // the appended version's stats index prunes across BOTH generations
    val (pr, nRead, nTotal) = Snapshots.readPruned(
      spark, root, None, "id", Some(lit(420L)), Some(lit(430L)))
    assert(pr.count() === 11L)
    assert(nRead > 0 && nRead < nTotal, s"read $nRead of $nTotal")
  }

  test("concurrent appends conflict-check: no batch's files are ever dropped") {
    val root = tmpDir("snap_app_occ")
    Snapshots.commit(spark, df(5), root)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(3)
    val threads = (1 to 3).map { i =>
      new Thread(() =>
        try {
          barrier.await()
          Snapshots.append(spark,
            (1 to 10).map(j => (i * 100L + j, s"t$i")).toDF("id", "s"), root)
        } catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(180000))
    assert(errors.isEmpty, s"append failed: ${errors.peek()}")
    // a lost-race append that blindly republished its stale manifest
    // would DROP the winner's files — the final version must hold all
    // three batches plus the base
    assert(Snapshots.read(spark, root).count() === 5L + 30L)
    assert(Snapshots.versions(spark, root) === Seq(1L, 2L, 3L, 4L))
  }

  test("merge: upsert semantics, bounded rewrite, untouched files by reference") {
    import spark.implicits._
    val root = tmpDir("snap_mrg")
    val v1 = Snapshots.commitWithStats(spark, kv(1L to 400L, "a"), root, Seq("id"))
    val filesV1 = Snapshots.filesOfVersion(spark, root, v1).toSet
    // key-localized updates (ids 10..20) + brand-new keys (501, 502)
    val upd = ((10L to 20L).map(i => (i, s"U$i")) ++
      Seq((501L, "N501"), (502L, "N502"))).toDF("id", "s")
    val r = Snapshots.merge(spark, upd, root, "id", Seq("id"))
    assert(r.version === v1 + 1)
    // the 4-file range-clustered layout localizes ids 10..20 in one
    // (at a sampled range boundary: two) file; 501/502 are beyond
    // every range and touch nothing
    assert(r.filesRewritten >= 1 && r.filesRewritten <= 2,
      s"rewrote ${r.filesRewritten} of ${r.filesTotal}")
    assert(r.filesTotal === 4)
    val filesV2 = Snapshots.filesOfVersion(spark, root, r.version).toSet
    assert((filesV1 & filesV2).size === r.filesTotal - r.filesRewritten,
      "untouched files not carried by reference")
    // row-level result: replaced + inserted + untouched
    val got = Snapshots.read(spark, root).as[(Long, String)].collect().toMap
    assert(got.size === 402)
    assert(got(15L) === "U15" && got(501L) === "N501")
    assert(got(9L) === "a9" && got(400L) === "a400")
    // time travel still sees the pre-merge rows
    assert(Snapshots.read(spark, root, Some(v1))
      .filter(col("id") === 15L).as[(Long, String)].head()._2 === "a15")
    // the merged version's reused+fresh stats index still prunes
    val (pr, nRead, nTotal) = Snapshots.readPruned(
      spark, root, None, "id", Some(lit(200L)), Some(lit(210L)))
    assert(pr.count() === 11L)
    assert(nRead < nTotal)
  }

  test("merge null-key updates insert; existing rows with the key untouched") {
    import spark.implicits._
    val root = tmpDir("snap_mrg_null")
    Snapshots.commitWithStats(spark,
      Seq((Some(1L), "a1"), (None: Option[Long], "anull"))
        .toDF("id", "s"), root, Seq("id"))
    val upd = Seq((Some(1L), "U1"), (None: Option[Long], "Unull"))
      .toDF("id", "s")
    Snapshots.merge(spark, upd, root, "id", Seq("id"))
    val got = Snapshots.read(spark, root).as[(Option[Long], String)].collect()
    // key 1 replaced; the null-key update INSERTED (null never
    // matches), the existing null-key row SURVIVED
    assert(got.toSet === Set((Some(1L), "U1"), (None, "anull"), (None, "Unull")))
  }

  test("deleteRange: bounded rewrite, nulls kept, old version retains rows") {
    import spark.implicits._
    val root = tmpDir("snap_del")
    val base = ((1L to 400L).map(i => (Some(i), s"a$i")) :+
      ((None: Option[Long], "anull"))).toDF("id", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    val v1 = Snapshots.commitWithStats(spark, base, root, Seq("id"))
    val r = Snapshots.deleteRange(spark, root, "id",
      Some(lit(301L)), None, Seq("id"))
    assert(r.filesRewritten < r.filesTotal, s"${r.filesRewritten}/${r.filesTotal}")
    val got = Snapshots.read(spark, root)
    assert(got.filter(col("id") >= 301L).count() === 0L)
    // NULL id is NOT in the deleted range — SQL DELETE keeps it
    assert(got.filter(col("id").isNull).count() === 1L)
    assert(got.count() === 301L)
    // retention: the old version still has the purged rows until vacuum
    assert(Snapshots.read(spark, root, Some(v1)).count() === 401L)
  }

  test("vacuum keeps dirs pinned by kept manifests, reclaims dropped manifests+stats") {
    val root = tmpDir("snap_vac_man")
    Snapshots.commitWithStats(spark, kv(1L to 200L, "a"), root, Seq("id"))
    Snapshots.append(spark, kv(201L to 300L, "b"), root, Seq("id"))
    val r = Snapshots.merge(spark,
      Seq((5L, "U5")).toDF("id", "s"), root, "id", Seq("id"))
    Snapshots.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0)
    assert(Snapshots.versions(spark, root) === Seq(r.version))
    // the kept manifest references files inside v1's AND v2's dirs —
    // both must survive, plus the merge's fresh dir
    assert(Snapshots.read(spark, root).count() === 300L)
    val mans = new java.io.File(s"$root/manifests").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")) // local-FS .crc sidecars
    assert(mans.length === 1, s"dropped manifests survived: ${mans.mkString(",")}")
    // pruned reads still serve from the kept layout's stats
    val (pr, _, _) = Snapshots.readPruned(
      spark, root, None, "id", Some(lit(250L)), Some(lit(260L)))
    assert(pr.count() === 11L)
  }

  test("copy-on-write refuses a stats index that does not cover the version") {
    val root = tmpDir("snap_cov")
    Snapshots.commitWithStats(spark, kv(1L to 100L, "a"), root, Seq("id"))
    // corrupt the invariant: drop one file's stats row
    val m = Snapshots.versionMeta(spark, root, 1L)
    val sp = s"$root/_stats/${m.layoutId}"
    val crippled = spark.read.parquet(sp).limit(2)
    graft.etl.Load.writeAtomic(spark, crippled, sp)
    val ex = intercept[IllegalArgumentException] {
      Snapshots.merge(spark, Seq((1L, "U")).toDF("id", "s"),
        root, "id", Seq("id"))
    }
    assert(ex.getMessage.contains("covers"), ex.getMessage)
  }

  test("append tags: lastTag rises, rollback does not propagate tags") {
    val root = tmpDir("snap_tag")
    assert(Snapshots.lastTag(spark, root).isEmpty)
    Snapshots.append(spark, df(2), root, tag = Some(0L))
    Snapshots.append(spark, df(3), root, tag = Some(1L))
    assert(Snapshots.lastTag(spark, root) === Some(1L))
    val v3 = Snapshots.rollback(spark, root, 1L)
    assert(Snapshots.versionMeta(spark, root, v3).tag.isEmpty)
    // tag survives being buried by an untagged version
    assert(Snapshots.lastTag(spark, root) === Some(1L))
  }

  test("streaming snapshot ingest: version per batch, fresh-checkpoint replay is a no-op") {
    import spark.implicits._
    val base = tmpDir("snap_stream")
    val li = (1L to 300L).map(i => (i, i % 7)).toDF("id", "grp")
    graft.streaming.Ingest.stageOrderedParquet(spark, Seq(
      li.filter(col("id") <= 100L),
      li.filter(col("id") > 100L && col("id") <= 200L),
      li.filter(col("id") > 200L)), s"$base/staging")
    graft.streaming.Ingest.snapshotIngestAvailableNow(spark,
      s"$base/staging", s"$base/chk", s"$base/t", Seq("id"),
      "id LONG, grp LONG", maxFilesPerTrigger = Some(1))
    assert(Snapshots.versions(spark, s"$base/t") === Seq(1L, 2L, 3L))
    assert(Snapshots.read(spark, s"$base/t").count() === 300L)
    // each version is the prefix union — batch boundaries time-travel
    assert(Snapshots.read(spark, s"$base/t", Some(1L)).count() === 100L)
    assert(Snapshots.read(spark, s"$base/t", Some(2L)).count() === 200L)
    // a FRESH checkpoint replays batch ids 0..2 — all tagged already,
    // so the table must not grow (exactly-once across replays)
    graft.streaming.Ingest.snapshotIngestAvailableNow(spark,
      s"$base/staging", s"$base/chk2", s"$base/t", Seq("id"),
      "id LONG, grp LONG", maxFilesPerTrigger = Some(1))
    assert(Snapshots.versions(spark, s"$base/t") === Seq(1L, 2L, 3L))
    assert(Snapshots.read(spark, s"$base/t").count() === 300L)
    // the stream-maintained stats prune range reads over the table
    val (pr, nRead, nTotal) = Snapshots.readPruned(
      spark, s"$base/t", None, "id", Some(lit(150L)), Some(lit(160L)))
    assert(pr.count() === 11L)
    assert(nRead < nTotal)
  }

  test("append runs exactly the batch write — zero jobs over prior data") {
    // the metadata-only claim, pinned the way the commit test pins
    // n_rows: appending to a table must cost one Spark job (the fresh
    // batch's write) regardless of how much data the table holds
    val root = tmpDir("snap_app_jobs")
    Snapshots.commit(spark, df(50), root)
    def jobsIn(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      var last = -1
      var n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while (n != last && spins < 50) {
        last = n; Thread.sleep(100)
        n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        spins += 1
      }
      n
    }
    assert(jobsIn("snap_append_probe") {
      Snapshots.append(spark, df(5), root)
    } === 1, "append must not re-read or re-count the existing table")
    assert(Snapshots.read(spark, root).count() === 55L)
  }

  test("schema evolution: added column rides the log; old files read as nulls") {
    import spark.implicits._
    val root = tmpDir("snap_evo")
    Snapshots.commitWithStats(spark, kv(1L to 100L, "a"), root, Seq("id"))
    // an unevolved append must REFUSE a drifted batch
    intercept[IllegalArgumentException] {
      Snapshots.append(spark,
        Seq((101L, "b101", "web")).toDF("id", "s", "channel"), root)
    }
    val v2 = Snapshots.append(spark,
      (101L to 150L).map(i => (i, s"b$i", "web")).toDF("id", "s", "channel"),
      root, Seq("id"), evolveSchema = true)
    val latest = Snapshots.read(spark, root)
    assert(latest.columns.toSeq === Seq("id", "s", "channel"))
    // pre-evolution rows surface the added column as NULL; the batch
    // carries its values — and NO footer merging decided this, the
    // logged schema did
    assert(latest.filter(col("channel").isNull).count() === 100L)
    assert(latest.filter(col("channel") === "web").count() === 50L)
    // type conflicts on a shared column are refused
    intercept[IllegalArgumentException] {
      Snapshots.append(spark,
        Seq((151L, 7L, "x")).toDF("id", "s", "channel"),
        root, evolveSchema = true)
    }
    // a MERGE after the evolution keeps the evolved schema readable
    val upd = Seq((5L, "U5", "store")).toDF("id", "s", "channel")
    Snapshots.merge(spark, upd, root, "id", Seq("id"))
    val got = Snapshots.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "s", "channel"))
    assert(got.filter(col("id") === 5L).select("channel")
      .as[String].head() === "store")
    assert(got.filter(col("channel").isNull).count() === 99L)
    // pruned reads honor the evolved schema too
    val (pr, _, _) = Snapshots.readPruned(
      spark, root, Some(v2), "id", Some(lit(120L)), Some(lit(130L)))
    assert(pr.columns.toSeq === Seq("id", "s", "channel"))
    assert(pr.count() === 11L)
  }

  test("optimize clusterBy: re-clustered compaction restores range pruning") {
    import spark.implicits._
    val root = tmpDir("snap_opt_cl")
    // micro-batch accretion: 6 appends, each an id-INTERLEAVED slice
    // (every file spans ~the whole key range — stats prune nothing)
    Snapshots.commitWithStats(spark,
      (1L to 6000L by 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1),
      root, Seq("id"))
    (1L to 5L).foreach { r =>
      Snapshots.append(spark,
        ((1L + r) to 6000L by 6L).map(i => (i, s"r$i")).toDF("id", "s")
          .coalesce(1),
        root, Seq("id"))
    }
    val (_, beforeRead, beforeTotal) = Snapshots.readPruned(
      spark, root, None, "id", Some(lit(1000L)), Some(lit(1010L)))
    assert(beforeRead === beforeTotal, "interleaved layout should not prune")
    val v = Snapshots.optimize(spark, root, targetBytes = 16L * 1024,
      statsCols = Seq("id"), clusterBy = Seq("id"))
    val (pr, afterRead, afterTotal) = Snapshots.readPruned(
      spark, root, Some(v), "id", Some(lit(1000L)), Some(lit(1010L)))
    assert(pr.count() === 11L)
    assert(afterTotal > 1, s"compaction produced $afterTotal files")
    assert(afterRead < afterTotal,
      s"re-clustered layout must prune: $afterRead of $afterTotal")
    assert(Snapshots.read(spark, root).count() === 6000L)
  }

  test("rollback to a version that was never committed is refused") {
    val root = tmpDir("snap_dup")
    Snapshots.commit(spark, df(1), root)
    intercept[IllegalArgumentException] {
      Snapshots.rollback(spark, root, to = 99L)
    }
    // and an empty root refuses reads instead of returning garbage
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, tmpDir("snap_empty"))
    }
  }
}
