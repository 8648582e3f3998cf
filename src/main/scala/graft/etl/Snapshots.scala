package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Versioned table snapshots with time travel — the Delta-lite
  * commit protocol over plain parquet dirs, completing the table-
  * maintenance tier ([[Load.writeSharded]]'s commit marker,
  * [[Load.compact]], [[Load.writeClustered]]) with history. The
  * reference upserts destructively with no history or undo
  * (`main.py:50,85` — a bad batch permanently overwrites good
  * rows); at 100 TB "restore yesterday" must be metadata-only,
  * which is what the version log below provides:
  *
  * {{{
  *   <root>/_versions/v00000001.json   // version log (commit points)
  *   <root>/data/c-<nonce>/ ...        // immutable snapshot data
  * }}}
  *
  * Commit protocol (MULTI-writer, any number of readers — Delta-
  * style optimistic concurrency):
  *  1. the snapshot's data dir — writer-UNIQUE, never shared —
  *     is fully written (and its _SUCCESS present) BEFORE the
  *     version file appears;
  *  2. the version file is created by write-to-temp + atomic rename —
  *     its EXISTENCE is the commit point, exactly the
  *     `_MANIFEST.json` discipline of [[Load.writeSharded]]; rename
  *     fails if the destination exists, so exactly one writer wins
  *     each version number and a loser retries at the next (a tiny
  *     metadata retry — its unique data dir is untouched).
  *  A crash mid-write leaves an orphan `data/c-*` dir that no
  *  version references — invisible to readers, reclaimed by
  *  [[vacuum]] — never a readable-but-partial version.
  *
  * Time travel: every version file records which data dir it reads
  * from, so old versions stay readable after later commits, and
  * [[rollback]] is METADATA-ONLY — it publishes a new version that
  * points at an old version's data dir (no copy; the 100 TB-scale
  * undo must not rewrite 100 TB).
  *
  * Scale notes: the version log is one tiny JSON file per commit
  * (listed, not read, to find the latest); data dirs are immutable,
  * so caching/scan layers never see in-place mutation; [[vacuum]]
  * bounds storage to the retained history.
  */
object Snapshots {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsDir(root: String) = new Path(root, "_versions")

  private def versionFile(root: String, v: Long) =
    new Path(versionsDir(root), f"v$v%08d.json")

  private val VFILE = """v(\d{8})\.json""".r

  /** All committed versions, ascending (a directory listing of the
    * version log — no file contents read).
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = versionsDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case VFILE(n) => n.toLong
    }.sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Parse the metadata fields readers need (dataDir, nRows) without
    * a JSON library: the version files are written by this object, so
    * the field shape is fixed.
    */
  private def versionMeta(spark: SparkSession, root: String, v: Long): (String, Long) = {
    val vf = versionFile(root, v)
    val f = fs(spark, vf)
    require(f.exists(vf), s"$root has no committed version $v")
    val in = f.open(vf)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val dir = """"data_dir":"([^"]+)"""".r.findFirstMatchIn(body) match {
      case Some(m) => m.group(1)
      case None => throw new IllegalStateException(s"$vf is not a version file")
    }
    // missing n_rows is as malformed as a missing data_dir — a silent
    // -1 would be re-published verbatim by rollback into a version
    // file the \d+ regex can never re-parse
    val n = """"n_rows":(\d+)""".r.findFirstMatchIn(body) match {
      case Some(m) => m.group(1).toLong
      case None => throw new IllegalStateException(s"$vf is not a version file")
    }
    (dir, n)
  }

  private def dataDirOf(spark: SparkSession, root: String, v: Long): String =
    versionMeta(spark, root, v)._1

  /** Commit `df` as the next version of `root`; returns the new
    * version number. MULTI-WRITER SAFE (Delta-style optimistic
    * concurrency): the snapshot data lands under a writer-UNIQUE
    * dir — never a version-numbered one, so two concurrent
    * committers can never overwrite each other's data — and the
    * version file's atomic create-by-rename is the ONLY
    * serialization point. A writer that loses the publish race
    * simply re-publishes at the next version number (its data dir
    * is untouched); conflict cost is one tiny metadata retry,
    * never a data rewrite. The result is a linear history in which
    * every concurrent commit lands as SOME version — the same
    * contract Delta's commit protocol gives on a transaction-log
    * conflict with no data conflict.
    */
  def commit(spark: SparkSession, df: DataFrame, root: String): Long = {
    val (dataDir, nRows) = writeDataDir(spark, df, root)
    publishNext(spark, root, dataDir, nRows)
  }

  /** Write `df` into a fresh writer-unique data dir under `root`;
    * returns (relative data dir, row count). n_rows rides the write
    * itself (Observation = a named accumulator over the rows the
    * writer actually emits) — no second listing + count job over
    * what, at target scale, is millions of fresh files.
    */
  private def writeDataDir(spark: SparkSession, df: DataFrame,
                           root: String): (String, Long) = {
    val dataDir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
    val dataPath = new Path(root, dataDir)
    val obs = org.apache.spark.sql.Observation(
      s"graft_commit_${java.util.UUID.randomUUID().toString.take(8)}")
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(dataPath.toString)
    (dataDir, obs.get("n_rows").asInstanceOf[Long])
  }

  /** Publish `dataDir` at the next free version number, retrying
    * past publish races (shared by commit and rollback).
    */
  private def publishNext(spark: SparkSession, root: String,
                          dataDir: String, nRows: Long): Long = {
    var v = latestVersion(spark, root).getOrElse(0L) + 1
    var attempts = 0
    while (!tryPublish(spark, root, v, dataDir, nRows)) {
      attempts += 1
      require(attempts < 1000, s"$root: lost $attempts publish races — livelock?")
      v = math.max(v + 1, latestVersion(spark, root).getOrElse(0L) + 1)
    }
    v
  }

  /** Attempt to publish version `v` pointing at `dataDir`: write to
    * a writer-unique temp name in the same dir, then promote with
    * CREATE-EXCLUSIVE semantics — exactly one writer wins a version
    * number; readers see either no version or a complete one.
    * Returns false on a lost race (destination already committed by
    * another writer).
    *
    * The promote step is filesystem-aware because plain rename is
    * NOT create-exclusive everywhere: POSIX rename(2) — what the
    * local FS delegates to — silently REPLACES an existing
    * destination, which would let two concurrent committers both
    * "win" version v, one of them silently losing its commit. On the
    * local FS the promote is therefore `link(2)` (atomic, fails
    * EEXIST if the destination exists); on HDFS-like filesystems
    * `FileSystem.rename` already fails when the destination exists
    * and stays the promote step.
    */
  private def tryPublish(spark: SparkSession, root: String, v: Long,
                         dataDir: String, nRows: Long): Boolean = {
    val vf = versionFile(root, v)
    val f = fs(spark, vf)
    f.mkdirs(vf.getParent)
    if (f.exists(vf)) return false
    val tmp = new Path(vf.getParent,
      s".${vf.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, true)
    try out.write(
      s"""{"version":$v,"data_dir":"$dataDir","n_rows":$nRows}""".getBytes("UTF-8"))
    finally out.close()
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(vf.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          f.delete(tmp, false); false // lost the race — caller retries at v+1
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          // file:// mounts without hard-link support (some network /
          // overlay filesystems): fall back to the rename promote with
          // an exists re-check — a narrower race window than link(2)'s
          // EEXIST guarantee, but never a spuriously failing commit
          renamePromote(f, tmp, vf)
      }
    } else renamePromote(f, tmp, vf)
  }

  /** HDFS-style promote: `FileSystem.rename` fails when the
    * destination exists, so the rename itself is the commit point;
    * a lost race surfaces as rename-failed + destination-present.
    */
  private def renamePromote(f: FileSystem, tmp: Path, vf: Path): Boolean =
    if (f.rename(tmp, vf)) true
    else {
      f.delete(tmp, false)
      if (f.exists(vf)) false // lost the race — caller retries at v+1
      else throw new IllegalStateException(s"could not publish $vf")
    }

  /** Read the table at `version` (default: latest). Old versions
    * remain readable after later commits — the time-travel read.
    */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed versions"))
    spark.read.parquet(new Path(root, dataDirOf(spark, root, v)).toString)
  }

  /** Metadata-only undo: publish a NEW version whose data dir is
    * version `to`'s. History stays linear and append-only (the bad
    * version remains inspectable), and no data is copied.
    */
  def rollback(spark: SparkSession, root: String, to: Long): Long = {
    // metadata-only all the way: the target version file already
    // records its n_rows, so the undo triggers no read of the data
    val (dataDir, nRows) = versionMeta(spark, root, to)
    publishNext(spark, root, dataDir, nRows)
  }

  // --- per-version data skipping (Snapshots × StatsIndex) ---

  /** Stats table location for a snapshot data dir — keyed by the
    * DATA DIR name, not the version number: a [[rollback]] re-points
    * a new version at an old dir whose stats already exist, so the
    * metadata-only undo keeps its skipping index with zero work.
    */
  private def statsPath(root: String, dataDir: String): Path =
    new Path(new Path(root, "_stats"), dataDir.stripPrefix("data/"))

  /** [[commit]] + build and persist the per-file min/max stats index
    * for the new version's data dir ([[StatsIndex]]) — the commit
    * hook that makes TIME-TRAVEL reads data-skipping-capable: old
    * versions stay readable AND prunable. Snapshot data dirs are
    * immutable once published, so the hook is one
    * [[StatsIndex.build]] pass over exactly the files this commit
    * wrote (never the table's history); [[StatsIndex.updateFor]]
    * remains the maintenance hook for IN-PLACE append tables, which
    * snapshots by construction are not.
    */
  def commitWithStats(spark: SparkSession, df: DataFrame, root: String,
                      cols: Seq[String]): Long = {
    val v = commit(spark, df, root)
    ensureStats(spark, root, dataDirOf(spark, root, v), cols)
    v
  }

  /** Build + persist the skipping index for `dataDir` unless it
    * already exists (a re-used dir — rollback target — keeps its
    * stats with zero work).
    */
  private def ensureStats(spark: SparkSession, root: String,
                          dataDir: String, cols: Seq[String]): Unit = {
    val sp = statsPath(root, dataDir)
    if (!fs(spark, sp).exists(sp))
      StatsIndex.buildAndSave(spark,
        new Path(root, dataDir).toString, cols, sp.toString)
  }

  /** Delta-OPTIMIZE for the snapshot tier: rewrite the LATEST
    * version's data into ⌈bytes/targetBytes⌉ files and publish the
    * compacted layout as a NEW version — data identical, history
    * intact (the small-file version stays readable until [[vacuum]]
    * reclaims it), and multi-writer safe with a real conflict check:
    * the compacted layout publishes at EXACTLY readVersion+1, so a
    * concurrent commit landing after the read makes the publish lose
    * — the stale rewrite is discarded and the NEW latest re-compacts
    * (never shadowed). [[Load.compact]] is the
    * in-place form for plain tables; snapshot data dirs are
    * immutable, so HERE compaction must be a new version — which is
    * exactly what makes it safe to run while readers time-travel.
    * With `statsCols` set the compacted version gets its skipping
    * index like any [[commitWithStats]] commit (fewer, larger files
    * ⇒ the same stats table prunes with coarser granularity —
    * re-cluster via [[Load.writeClustered]]/[[ZOrder]] upstream when
    * range-tightness matters more than file count).
    */
  def optimize(spark: SparkSession, root: String,
               targetBytes: Long = 128L * 1024 * 1024,
               statsCols: Seq[String] = Nil): Long = {
    // Optimistic CONFLICT CHECK, not just optimistic publish: a
    // compaction's data is a function of the version it read, so if a
    // concurrent ingest commit lands after we read `v`, publishing the
    // compaction at any later number would SHADOW that commit (the new
    // latest = a compaction of pre-ingest data). Delta's OPTIMIZE
    // conflict-checks for the same reason. The check is made atomic by
    // publishing at EXACTLY v+1 with create-exclusive semantics: if
    // v+1 exists, someone committed after our read — our rewrite is
    // stale, so we drop it and re-compact the new latest. The stale
    // dir is deleted eagerly (it is this writer's own orphan).
    var attempts = 0
    while (true) {
      val v = latestVersion(spark, root).getOrElse(
        throw new IllegalArgumentException(s"$root has no committed versions"))
      val dataPath = new Path(root, dataDirOf(spark, root, v))
      val bytes = fs(spark, dataPath).getContentSummary(dataPath).getLength
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val df = spark.read.parquet(dataPath.toString).repartition(nFiles)
      val (dataDir, nRows) = writeDataDir(spark, df, root)
      if (tryPublish(spark, root, v + 1, dataDir, nRows)) {
        if (statsCols.nonEmpty) ensureStats(spark, root, dataDir, statsCols)
        return v + 1
      }
      fs(spark, new Path(root, dataDir)).delete(new Path(root, dataDir), true)
      attempts += 1
      require(attempts < 100, s"$root: optimize lost $attempts commit races")
    }
    -1L // unreachable
  }

  /** Time-travel read THROUGH the version's stats index: the file
    * list prunes from metadata alone, then only candidate files
    * open ([[StatsIndex.prunedRead]]'s contract, against the
    * version's immutable data dir). Returns (frame, files read,
    * files total).
    */
  def readPruned(spark: SparkSession, root: String, version: Option[Long],
                 c: String, lo: Option[Column], hi: Option[Column])
      : (DataFrame, Int, Int) = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed versions"))
    val dataDir = dataDirOf(spark, root, v)
    val sp = statsPath(root, dataDir)
    require(fs(spark, sp).exists(sp),
      s"version $v of $root has no stats index — commit via commitWithStats")
    StatsIndex.prunedRead(spark, new Path(root, dataDir).toString,
      spark.read.parquet(sp.toString), c, lo, hi)
  }

  /** Reclaim storage: keep the last `keepLast` versions (and
    * whatever data dirs they reference — a rollback target stays
    * alive as long as any kept version points at it), delete older
    * version files and now-unreferenced data dirs, INCLUDING orphan
    * dirs from crashed commits that never published.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
             orphanGraceMs: Long = 24L * 3600 * 1000): Unit = {
    require(keepLast >= 1)
    val all = versions(spark, root)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    val keepDirs = keep.map(dataDirOf(spark, root, _)).toSet
    val f = fs(spark, new Path(root))
    drop.foreach(v => f.delete(versionFile(root, v), false))
    val dataRoot = new Path(root, "data")
    // an unreferenced dir younger than the grace window may be an
    // IN-FLIGHT commit (data written, version not yet published) —
    // deleting it would corrupt the concurrent writer. Delta's
    // vacuum retention threshold exists for exactly this race; the
    // default grace comfortably exceeds any sane commit duration.
    // orphanGraceMs = 0 restores eager reclaim for offline cleanup.
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      val rel = s"data/${st.getPath.getName}"
      if (!keepDirs.contains(rel) && st.getModificationTime <= cutoff) {
        f.delete(st.getPath, true)
        // a reclaimed dir's skipping index is dead weight too
        f.delete(statsPath(root, rel), true)
      }
    }
  }
}
