package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.sql.Connection

/** The sink seam SURVEY §7.3 promises: the streaming/batch pipeline
  * targets an [[UpsertSink]], so the parquet stand-in and a real
  * key-conflict-aware database (the reference's `INSERT … ON
  * CONFLICT` target, reference `main.py:27-59`) are interchangeable
  * without touching the transform or ingest layers.
  */
trait UpsertSink extends Serializable {
  /** Latest-wins upsert of `batch` on the business `keys`. */
  def upsert(batch: DataFrame, keys: Seq[String]): Unit
}

/** Parquet-table implementation — delegates to [[Load.upsert]]'s
  * bucket-partitioned latest-wins merge.
  */
final class ParquetUpsertSink(spark: SparkSession, path: String) extends UpsertSink {
  def upsert(batch: DataFrame, keys: Seq[String]): Unit =
    Load.upsert(spark, batch, path, keys)
}

/** How one partition's rows reach a JDBC target. Single-statement
  * dialects (Postgres `ON CONFLICT`, ANSI `MERGE`) batch one
  * prepared statement; engines without a row-source upsert statement
  * (Derby rejects any non-base-table MERGE source) use the portable
  * UPDATE-then-INSERT form.
  */
trait UpsertDialect extends Serializable {
  def upsertRows(conn: Connection, table: String, schema: StructType,
                 keys: Seq[String], rows: Iterator[Row], batchSize: Int): Unit
}

/** Dialects expressible as ONE statement binding every column in
  * schema order, executed in JDBC batches.
  */
trait SingleStatementDialect extends UpsertDialect {
  def statement(table: String, schema: StructType, keys: Seq[String]): String

  final def upsertRows(conn: Connection, table: String, schema: StructType,
                       keys: Seq[String], rows: Iterator[Row], batchSize: Int): Unit = {
    val st = conn.prepareStatement(statement(table, schema, keys))
    try {
      var n = 0
      rows.foreach { r =>
        var i = 0
        while (i < schema.length) { st.setObject(i + 1, r.get(i)); i += 1 }
        st.addBatch()
        n += 1
        if (n % batchSize == 0) st.executeBatch()
      }
      st.executeBatch()
      ()
    } finally st.close()
  }
}

object UpsertDialect {

  private[etl] def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(32672)"
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => sys.error(s"no JDBC mapping for $other")
  }

  /** PostgreSQL `INSERT … ON CONFLICT (keys) DO UPDATE` — the
    * reference's exact conflict semantics (`main.py:27-59`).
    */
  object PostgresOnConflict extends SingleStatementDialect {
    def statement(table: String, schema: StructType, keys: Seq[String]): String = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val action =
        if (nonKeys.isEmpty) " DO NOTHING"
        else " DO UPDATE SET " + nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keys.mkString(", ")})$action"
    }
  }

  /** ANSI `MERGE INTO` with a one-row VALUES source, parameter
    * markers CAST to the column's SQL type. For engines whose MERGE
    * accepts a derived-table source (SQL Server, Oracle, BigQuery —
    * NOT Derby, which demands a base table).
    */
  object AnsiMerge extends SingleStatementDialect {
    def statement(table: String, schema: StructType, keys: Seq[String]): String = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val typedMarks = schema.fields
        .map(f => s"CAST(? AS ${sqlType(f.dataType)})").mkString(", ")
      val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
      val upd =
        if (nonKeys.isEmpty) ""
        else s" WHEN MATCHED THEN UPDATE SET ${nonKeys.map(c => s"$c = s.$c").mkString(", ")}"
      s"MERGE INTO $table t USING (VALUES ($typedMarks)) " +
        s"AS s (${cols.mkString(", ")}) ON $on$upd " +
        s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(c => s"s.$c").mkString(", ")})"
    }
  }

  /** Portable two-statement upsert: UPDATE on the key, INSERT when
    * zero rows matched. Works on any JDBC target (integration-tested
    * offline on embedded Derby); row-at-a-time, so prefer a native
    * single-statement dialect where one exists.
    */
  object UpdateInsert extends UpsertDialect {
    def updateSql(table: String, schema: StructType, keys: Seq[String]): String = {
      val nonKeys = schema.fieldNames.toSeq.filterNot(keys.contains)
      require(nonKeys.nonEmpty, "all-key rows: use insert-ignore semantics instead")
      s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")}"
    }
    def insertSql(table: String, schema: StructType): String = {
      val cols = schema.fieldNames.toSeq
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    }

    def upsertRows(conn: Connection, table: String, schema: StructType,
                   keys: Seq[String], rows: Iterator[Row], batchSize: Int): Unit = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val upd = conn.prepareStatement(updateSql(table, schema, keys))
      val ins = conn.prepareStatement(insertSql(table, schema))
      try {
        rows.foreach { r =>
          def v(c: String) = r.get(r.fieldIndex(c))
          (nonKeys ++ keys).zipWithIndex
            .foreach { case (c, i) => upd.setObject(i + 1, v(c)) }
          if (upd.executeUpdate() == 0) {
            cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, v(c)) }
            ins.executeUpdate()
            ()
          }
        }
      } finally { upd.close(); ins.close() }
    }
  }
}

/** JDBC implementation: each PARTITION opens one connection and
  * upserts its rows through the dialect — executor-side, nothing
  * collected to the driver; per-batch cost is O(batch rows),
  * independent of target-table size (the database's key index does
  * the conflict lookup).
  *
  * `url` + `props` (not a Connection) so the sink is serializable;
  * the driver class resolves via DriverManager on each executor.
  */
final class JdbcUpsertSink(url: String, table: String,
                           props: Map[String, String] = Map.empty,
                           dialect: UpsertDialect = UpsertDialect.PostgresOnConflict,
                           jdbcBatchSize: Int = 500) extends UpsertSink {
  def upsert(batch: DataFrame, keys: Seq[String]): Unit = {
    val ready = Load.sinkReady(batch)
    val schema = ready.schema
    val (u, t, d, bs) = (url, table, dialect, jdbcBatchSize)
    val propSeq = props.toSeq
    ready.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new java.util.Properties()
        propSeq.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(u, p)
        try {
          conn.setAutoCommit(false)
          d.upsertRows(conn, t, schema, keys, rows, bs)
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
