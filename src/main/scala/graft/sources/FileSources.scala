package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** S3/F1: tabular file scan with row-level corruption capture.
  *
  * The reference skips a whole unreadable workbook with a log line
  * (`main.py:99-101`) — file-grained failure. The Spark-native
  * replacement is row-grained: PERMISSIVE mode parses what it can
  * and captures the raw text of malformed rows in a corrupt-record
  * column, so one bad row doesn't discard a file and the bad rows
  * are routable to quarantine (F5) instead of lost.
  */
object FileSources {

  val CorruptCol = "_corrupt_record"

  /** CSV scan with explicit schema + corrupt-record capture. */
  def csvPermissive(spark: SparkSession, path: String, schema: StructType,
                    header: Boolean = true): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** JSON scan, same contract. */
  def jsonPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Split a permissive scan into (parsed, corrupt) — corrupt rows
    * keep their raw text for quarantine.
    */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    // Spark forbids queries touching only the corrupt-record column
    // on a raw scan; cache the parsed result first (documented
    // workaround in the error itself).
    df.cache()
    val parsed = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val corrupt = df.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw"))
    (parsed, corrupt)
  }
}
