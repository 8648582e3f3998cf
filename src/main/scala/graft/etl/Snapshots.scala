package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots with time travel — the Delta-lite
  * commit protocol over plain parquet dirs, completing the table-
  * maintenance tier ([[Load.writeSharded]]'s commit marker,
  * [[Load.compact]], [[Load.writeClustered]]) with history:
  *
  * {{{
  *   <root>/_versions/v00000001.json   // version log (commit points)
  *   <root>/data/v1/ ...               // immutable snapshot data
  * }}}
  *
  * Commit protocol (single writer, any number of readers):
  *  1. the snapshot's data dir is fully written (and its _SUCCESS
  *     present) BEFORE the version file appears;
  *  2. the version file is created by write-to-temp + atomic rename —
  *     its EXISTENCE is the commit point, exactly the
  *     `_MANIFEST.json` discipline of [[Load.writeSharded]].
  *  A crash mid-write leaves an orphan `data/v*` dir that no version
  *  references — invisible to readers, reclaimed by [[vacuum]] —
  *  never a readable-but-partial version.
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

  /** Parse the one metadata field readers need (dataDir) without a
    * JSON library: the version files are written by this object, so
    * the field shape is fixed.
    */
  private def dataDirOf(spark: SparkSession, root: String, v: Long): String = {
    val vf = versionFile(root, v)
    val f = fs(spark, vf)
    require(f.exists(vf), s"$root has no committed version $v")
    val in = f.open(vf)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    """"data_dir":"([^"]+)"""".r.findFirstMatchIn(body) match {
      case Some(m) => m.group(1)
      case None => throw new IllegalStateException(s"$vf is not a version file")
    }
  }

  /** Commit `df` as the next version of `root`; returns the new
    * version number. The data lands under an immutable per-version
    * dir; the version file's atomic rename is the commit point.
    */
  def commit(spark: SparkSession, df: DataFrame, root: String): Long = {
    val v = latestVersion(spark, root).getOrElse(0L) + 1
    val dataDir = s"data/v$v"
    val dataPath = new Path(root, dataDir)
    df.write.mode("overwrite").parquet(dataPath.toString)
    val nRows = spark.read.parquet(dataPath.toString).count()
    publish(spark, root, v, dataDir, nRows)
    v
  }

  /** Publish a version file pointing at `dataDir` (shared by commit
    * and the metadata-only rollback): write to a temp name in the
    * same dir, then rename — the rename is atomic on HDFS-like
    * filesystems and the local FS, so readers see either no version
    * or a complete one.
    */
  private def publish(spark: SparkSession, root: String, v: Long,
                      dataDir: String, nRows: Long): Unit = {
    val vf = versionFile(root, v)
    val f = fs(spark, vf)
    f.mkdirs(vf.getParent)
    require(!f.exists(vf), s"version $v already committed (concurrent writer?)")
    val tmp = new Path(vf.getParent, s".${vf.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(
      s"""{"version":$v,"data_dir":"$dataDir","n_rows":$nRows}""".getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, vf))
      throw new IllegalStateException(s"could not publish $vf")
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
    val dataDir = dataDirOf(spark, root, to)
    val nRows = spark.read.parquet(new Path(root, dataDir).toString).count()
    val v = latestVersion(spark, root).getOrElse(0L) + 1
    publish(spark, root, v, dataDir, nRows)
    v
  }

  /** Reclaim storage: keep the last `keepLast` versions (and
    * whatever data dirs they reference — a rollback target stays
    * alive as long as any kept version points at it), delete older
    * version files and now-unreferenced data dirs, INCLUDING orphan
    * dirs from crashed commits that never published.
    */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1)
    val all = versions(spark, root)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    val keepDirs = keep.map(dataDirOf(spark, root, _)).toSet
    val f = fs(spark, new Path(root))
    drop.foreach(v => f.delete(versionFile(root, v), false))
    val dataRoot = new Path(root, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      val rel = s"data/${st.getPath.getName}"
      if (!keepDirs.contains(rel)) f.delete(st.getPath, true)
    }
  }
}
