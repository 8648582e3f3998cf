package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index — the Delta/Iceberg pattern: a
  * per-file (row count, per-column min/max, null count) stats table
  * maintained NEXT TO a parquet dataset, so a range or point
  * predicate prunes the file LIST from metadata alone, without
  * opening a single parquet footer. Parquet footers already carry
  * these stats, but at 100 TB a table is millions of files and
  * "read every footer to decide what to skip" is itself the
  * bottleneck (per-file round trips on an object store); the stats
  * table turns planning into ONE bounded metadata scan — and it
  * composes with [[Load.writeClustered]] / [[ZOrder]], which exist
  * precisely to make per-file min/max ranges tight.
  *
  * The index is derived state: [[build]] is one aggregation over the
  * dataset grouped by `input_file_name()`, rewritten whenever the
  * dataset is (files are immutable once written — the same
  * assumption every table format makes). Pruning is conservative:
  * a file is kept whenever its [min, max] interval CAN intersect the
  * predicate, and files with all-null stats columns are always kept
  * — false positives cost a scan, false negatives would cost
  * correctness, so there are none by construction (q155's oracle
  * proves it value-for-value: a wrongly pruned file would change
  * the aggregate).
  */
object StatsIndex {

  /** One stats row per file: (file, n_rows, min_<c>, max_<c>,
    * nulls_<c> per stats column). One scan of the dataset, one
    * shuffle keyed by file name (#files groups — metadata-sized).
    */
  def build(spark: SparkSession, dataPath: String,
            cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one stats column")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    spark.read.parquet(dataPath)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** [[build]] + persist the stats table beside the data (the
    * "index commit"). Returns the stats path.
    */
  def buildAndSave(spark: SparkSession, dataPath: String,
                   cols: Seq[String], statsPath: String): String = {
    Load.writeAtomic(spark, build(spark, dataPath, cols), statsPath)
    statsPath
  }

  /** The candidate file list for `lo <= c <= hi` (either bound
    * optional), decided from the stats table alone. The collect is
    * the file LIST — the same driver-side object every parquet scan
    * plans with; at millions of files this is exactly the metadata
    * a Delta driver holds, and the selective case (the point of the
    * index) collects far fewer.
    */
  def candidateFiles(stats: DataFrame, c: String,
                     lo: Option[Column], hi: Option[Column]): Seq[String] = {
    val noStats = col(s"min_$c").isNull || col(s"max_$c").isNull
    val canHit = Seq(
      hi.map(h => col(s"min_$c") <= h),
      lo.map(l => col(s"max_$c") >= l)
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    stats.filter(noStats || canHit)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Pruned read: open ONLY the candidate files, re-applying the
    * predicate (the stats decide which files to open, never which
    * rows qualify). Returns the frame plus (files read, files total)
    * so callers can assert the prune actually bit.
    */
  def prunedRead(spark: SparkSession, dataPath: String, stats: DataFrame,
                 c: String, lo: Option[Column], hi: Option[Column])
      : (DataFrame, Int, Int) = {
    val total = stats.select("file").count().toInt
    val files = candidateFiles(stats, c, lo, hi)
    val bounded = Seq(lo.map(l => col(c) >= l), hi.map(h => col(c) <= h))
      .flatten.reduceOption(_ && _).getOrElse(lit(true))
    val df =
      if (files.isEmpty)
        // degenerate: no file can match — schema-preserving empty
        spark.read.parquet(dataPath).filter(lit(false))
      else spark.read.parquet(files: _*).filter(bounded)
    (df, files.size, total)
  }
}
