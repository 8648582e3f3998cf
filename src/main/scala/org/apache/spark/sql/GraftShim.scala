package org.apache.spark.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Thin bridge to the classic Column↔Expression converters and the
  * file-relation constructors, which are `private[sql]` at the Scala
  * level (public in bytecode). This is the standard extension-library
  * pattern (what table formats shipping their own FileIndex do) for
  * exposing custom Catalyst plumbing without a per-session function
  * registry round-trip.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  private def cs(spark: SparkSession): classic.SparkSession =
    spark.asInstanceOf[classic.SparkSession]

  /** DataFrame over an arbitrary logical plan (classic Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(cs(spark), plan)

  /** The session parser — for SQL helpers that rewrite the parsed
    * tree before analysis.
    */
  def parsePlan(spark: SparkSession, sqlText: String): LogicalPlan =
    cs(spark).sessionState.sqlParser.parsePlan(sqlText)

  /** A parquet scan plan over a CUSTOM [[FileIndex]] — the seam every
    * table format uses to own file listing/pruning while the built-in
    * `ParquetFileFormat` (vectorized reader, whole-stage codegen,
    * parquet filter pushdown) owns the bytes. `dataSchema` is the
    * authoritative schema (the snapshot tier's schema-in-the-log);
    * files missing a column surface it as NULL by parquet by-name
    * resolution.
    */
  def parquetScanPlan(spark: SparkSession, index: FileIndex,
                      dataSchema: StructType,
                      bucketSpec: Option[catalyst.catalog.BucketSpec] = None)
      : LogicalPlan = {
    val rel = HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = dataSchema,
      bucketSpec = bucketSpec,
      fileFormat = new ParquetFileFormat,
      options = Map.empty[String, String])(cs(spark))
    LogicalRelation(rel, isStreaming = false)
  }

  /** The analyzed plan of a DataFrame (classic queryExecution). */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
