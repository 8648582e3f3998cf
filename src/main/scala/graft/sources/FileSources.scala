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

  /** The pluggable raw-report source seam: the ingest layer reads
    * the staging folder through this interface, so the CSV
    * stand-in, the real in-repo .xlsx reader ([[Xlsx]]), or an
    * external spark-excel datasource are interchangeable without
    * touching transform/sink code.
    */
  trait RawSheetSource extends Serializable {
    /** All staged sheets under `dir` as one raw frame with exactly
      * the contract's columns (every cell a string).
      */
    def read(spark: SparkSession, dir: String, schema: StructType): DataFrame
  }

  /** CSV staging files (header row, permissive). */
  object CsvSheetSource extends RawSheetSource {
    def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
      spark.read.schema(schema).option("header", "true").csv(dir)
  }

  /** Real .xlsx workbooks — the named sheet of each (the reference's
    * `sheet_name='Paid order list'`, `main.py:98`).
    */
  final case class XlsxSheetSource(sheetName: String) extends RawSheetSource {
    def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
      Xlsx.readSheets(spark, dir, sheetName, schema).drop("_src_file")
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
