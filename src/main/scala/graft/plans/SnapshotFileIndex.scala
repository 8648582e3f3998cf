package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.etl.StatsIndex

/** The snapshot tier's [[FileIndex]] — the seam that makes a
  * versioned table a first-class Spark SQL scan (what Delta's
  * TahoeFileIndex / Iceberg's SparkScan do): the planner asks THIS
  * object which files exist, and the answer is (a) the version's
  * manifest — never a directory listing of mutable state — filtered
  * by (b) the version's file-level stats index, evaluated against
  * the query's OWN pushed data filters at planning time. Data
  * skipping therefore happens for ANY predicate a user writes — SQL
  * or DataFrame — not just calls through the explicit
  * [[graft.etl.Snapshots.readPruned]] seam, and the bytes are still
  * read by the built-in vectorized parquet reader under whole-stage
  * codegen (the index only shortens the file list).
  *
  * Skipping semantics are [[StatsIndex]]'s, conservative by
  * construction: a file is dropped only when its [min, max] interval
  * PROVABLY excludes the predicate; untranslatable predicates,
  * missing stats rows, and null stats keep the file. The translation
  * below covers the pushed shapes Catalyst actually emits for range
  * and point predicates (comparisons, In/InSet, IsNull/IsNotNull,
  * And/Or); everything else degrades to "open it" — false positives
  * cost a scan, false negatives would cost correctness, so there are
  * none by construction.
  *
  * The stats evaluation is itself a Spark plan over the metadata
  * table (one tiny job per planning pass, the Delta data-skipping
  * shape) — never a driver loop over file entries, so it holds at a
  * million-file manifest.
  */
final class SnapshotFileIndex(
    spark: SparkSession,
    root: Path,
    fileStatuses: Seq[FileStatus],
    stats: Option[DataFrame]) extends FileIndex {

  /** (files kept, files total) of the most recent planning pass —
    * the prune pin specs and queries assert on.
    */
  @volatile var lastScan: Option[(Int, Int)] = None

  private val statCols: Set[String] =
    stats.map(_.columns.toSeq.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSet).getOrElse(Set.empty)

  override def rootPaths: Seq[Path] = Seq(root)

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] =
    fileStatuses.map(_.getPath.toString).toArray

  /** Snapshot data is immutable — there is nothing to refresh. */
  override def refresh(): Unit = ()

  override def sizeInBytes: Long = fileStatuses.map(_.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = stats match {
      case Some(st) if dataFilters.nonEmpty && statCols.nonEmpty =>
        val conds = dataFilters.flatMap(SnapshotFileIndex.canHit(_, statCols))
        if (conds.isEmpty) fileStatuses
        else {
          val hit = st.filter(conds.reduce(_ && _)).select("file")
            .collect().iterator
            .map(r => SnapshotFileIndex.normPath(r.getString(0))).toSet
          fileStatuses.filter(f =>
            hit.contains(SnapshotFileIndex.normPath(f.getPath.toString)))
        }
      case _ => fileStatuses
    }
    lastScan = Some((kept.size, fileStatuses.size))
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

object SnapshotFileIndex {

  /** Scheme-insensitive path identity ("file:///x" ≡ "file:/x" ≡
    * "/x") — the stats side records `input_file_name()` URIs, the
    * listing side `Path.toString`; both normalize to the bare path.
    */
  private[graft] def normPath(s: String): String =
    s.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.\\-]*:/+", "/")

  /** Translate one pushed data filter into a can-hit condition over
    * the stats table, or None when the shape is not provably
    * decidable from min/max/null counts (→ caller keeps every file).
    */
  private[graft] def canHit(e: Expression, statCols: Set[String]): Option[Column] = {
    def name(x: Expression): Option[String] = x match {
      case a: Attribute if statCols(a.name) => Some(a.name)
      case _ => None
    }
    def value(l: Literal): Option[Column] =
      if (l.value == null) None else Some(GraftShim.column(l))
    e match {
      case EqualTo(a, l: Literal) => for (c <- name(a); v <- value(l))
        yield StatsIndex.hitExpr(c, Some(v), Some(v))
      case EqualTo(l: Literal, a) => canHit(EqualTo(a, l), statCols)
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        canHit(EqualTo(a, l), statCols)
      // strict bounds prune with their inclusive envelope — a file
      // whose max equals the excluded bound survives; sound, one
      // false-positive file at worst
      case GreaterThan(a, l: Literal) => for (c <- name(a); v <- value(l))
        yield StatsIndex.hitExpr(c, Some(v), None)
      case GreaterThanOrEqual(a, l: Literal) => for (c <- name(a); v <- value(l))
        yield StatsIndex.hitExpr(c, Some(v), None)
      case LessThan(a, l: Literal) => for (c <- name(a); v <- value(l))
        yield StatsIndex.hitExpr(c, None, Some(v))
      case LessThanOrEqual(a, l: Literal) => for (c <- name(a); v <- value(l))
        yield StatsIndex.hitExpr(c, None, Some(v))
      // mirrored operand order (lit op attr)
      case GreaterThan(l: Literal, a) => canHit(LessThan(a, l), statCols)
      case GreaterThanOrEqual(l: Literal, a) => canHit(LessThanOrEqual(a, l), statCols)
      case LessThan(l: Literal, a) => canHit(GreaterThan(a, l), statCols)
      case LessThanOrEqual(l: Literal, a) => canHit(GreaterThanOrEqual(a, l), statCols)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        name(a).flatMap { c =>
          val hits = vs.collect { case l: Literal if l.value != null =>
            StatsIndex.hitExpr(c, Some(GraftShim.column(l)),
              Some(GraftShim.column(l)))
          }
          hits.reduceOption(_ || _)
        }
      case InSet(a, hset) if hset.nonEmpty && hset.size <= 256 =>
        name(a).flatMap { c =>
          val dt = a.dataType
          val hits = hset.toSeq.filter(_ != null).map { v =>
            val lc = GraftShim.column(Literal(v, dt))
            StatsIndex.hitExpr(c, Some(lc), Some(lc))
          }
          hits.reduceOption(_ || _)
        }
      case IsNull(a) => name(a).map(c =>
        col(s"nulls_$c").isNull || col(s"nulls_$c") > 0L)
      case IsNotNull(a) => name(a).map(c =>
        col(s"nulls_$c").isNull || col("n_rows").isNull ||
          col(s"nulls_$c") < col("n_rows"))
      case And(l, r) =>
        (canHit(l, statCols), canHit(r, statCols)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) => for {
        a <- canHit(l, statCols); b <- canHit(r, statCols)
      } yield a || b
      case _ => None
    }
  }
}
