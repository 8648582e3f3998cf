package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-generated testdata
  * (TESTDATA.md). Explicit per-table accessors keep call sites
  * terse; `spark.read.parquet` gives Catalyst full pushdown
  * (column pruning + predicate pushdown reach the scan).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet forms across driver
    * testdata regens: TIMESTAMP(NANOS) — which Spark's TimestampType
    * (µs) cannot hold, so sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this reader
    * rebuilds a µs timestamp (integer `div`; a double division would
    * lose precision above 2^53 ns) — and, since 2026-08, a naive
    * `timestamp[us]` that reads as TIMESTAMP_NTZ and passes through
    * (watermark sites coerce via `Ingest.asEventTime`).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
