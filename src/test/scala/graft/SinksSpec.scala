package graft

import graft.etl.{JdbcUpsertSink, UpsertDialect}
import org.apache.spark.sql.types._
import java.sql.DriverManager

/** The SURVEY §7.3 sink seam: dialect statement generation (the
  * reference's `INSERT … ON CONFLICT` text) and a real executor-side
  * JDBC upsert against embedded Derby (MERGE dialect — the only
  * conflict-aware engine available offline).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("order_id", StringType),
    StructField("items", StringType),
    StructField("amount", DoubleType)))

  test("PostgresOnConflict generates the reference's upsert statement") {
    val sql = UpsertDialect.PostgresOnConflict
      .statement("pos_fact", schema, Seq("order_id", "items"))
    assert(sql ===
      "INSERT INTO pos_fact (order_id, items, amount) VALUES (?, ?, ?) " +
        "ON CONFLICT (order_id, items) DO UPDATE SET amount = EXCLUDED.amount")
    // all-key tables degrade to DO NOTHING, not an empty SET list
    val keysOnly = UpsertDialect.PostgresOnConflict
      .statement("t", StructType(schema.fields.take(2)), Seq("order_id", "items"))
    assert(keysOnly.endsWith("ON CONFLICT (order_id, items) DO NOTHING"))
  }

  test("AnsiMerge generates typed parameter markers") {
    val sql = UpsertDialect.AnsiMerge
      .statement("pos_fact", schema, Seq("order_id", "items"))
    assert(sql.contains("MERGE INTO pos_fact t USING (VALUES " +
      "(CAST(? AS VARCHAR(32672)), CAST(? AS VARCHAR(32672)), CAST(? AS DOUBLE)))"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET amount = s.amount"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (order_id, items, amount)"))
  }

  test("UpdateInsert generates portable two-statement upsert SQL") {
    assert(UpsertDialect.UpdateInsert.updateSql("fact", schema, Seq("order_id", "items"))
      === "UPDATE fact SET amount = ? WHERE order_id = ? AND items = ?")
    assert(UpsertDialect.UpdateInsert.insertSql("fact", schema)
      === "INSERT INTO fact (order_id, items, amount) VALUES (?, ?, ?)")
  }

  test("JdbcUpsertSink upserts into embedded Derby: insert, conflict update, idempotent replay") {
    val url = "jdbc:derby:memory:sinkdb;create=true"
    val setup = DriverManager.getConnection(url)
    setup.createStatement().execute(
      "CREATE TABLE fact (order_id VARCHAR(50) NOT NULL, " +
        "items VARCHAR(50) NOT NULL, amount DOUBLE, " +
        "PRIMARY KEY (order_id, items))")
    setup.close()

    // Derby's MERGE only takes base-table sources, so the portable
    // UPDATE-then-INSERT dialect is the one exercised end to end
    val sink = new JdbcUpsertSink(url, "fact", dialect = UpsertDialect.UpdateInsert)
    def readBack(): Seq[(String, String, Double)] = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT order_id, items, amount FROM fact ORDER BY order_id")
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
        while (rs.next()) buf += ((rs.getString(1), rs.getString(2), rs.getDouble(3)))
        buf.toSeq
      } finally c.close()
    }

    val v1 = Seq(("o1", "a", 1.0), ("o2", "b", 2.0))
      .toDF("order_id", "items", "amount").coalesce(1)
    sink.upsert(v1, Seq("order_id", "items"))
    assert(readBack() === Seq(("o1", "a", 1.0), ("o2", "b", 2.0)))

    // conflict: o1 updates in place; o3 inserts
    val v2 = Seq(("o1", "a", 9.0), ("o3", "c", 3.0))
      .toDF("order_id", "items", "amount").coalesce(1)
    sink.upsert(v2, Seq("order_id", "items"))
    assert(readBack() === Seq(("o1", "a", 9.0), ("o2", "b", 2.0), ("o3", "c", 3.0)))

    // replaying the same batch converges (at-least-once safe)
    sink.upsert(v2, Seq("order_id", "items"))
    assert(readBack() === Seq(("o1", "a", 9.0), ("o2", "b", 2.0), ("o3", "c", 3.0)))
  }

  test("streaming ingest drives the JDBC sink end to end (Derby fact table)") {
    import graft.etl.Transform
    import graft.streaming.Ingest
    import java.nio.file.{Files, Paths}
    val url = "jdbc:derby:memory:ingestdb;create=true"
    val setup = DriverManager.getConnection(url)
    setup.createStatement().execute(
      "CREATE TABLE pos_fact (order_id VARCHAR(50) NOT NULL, " +
        "items VARCHAR(200) NOT NULL, sub_category VARCHAR(100), " +
        "category VARCHAR(100), flavor VARCHAR(100), variation VARCHAR(100), " +
        "size_ VARCHAR(100), quantity DOUBLE, sugar_level VARCHAR(100), " +
        "spice_level VARCHAR(100), total_order_amount DOUBLE, " +
        "received_amount DOUBLE, payment_time VARCHAR(100) NOT NULL, " +
        "payment_type VARCHAR(100), order_type VARCHAR(100), " +
        "PRIMARY KEY (order_id, items, payment_time))")
    setup.close()

    val base = tmpDir("jdbc-ingest")
    val staging = base + "/staging"
    Files.createDirectories(Paths.get(staging))
    val header = "Order ID,Products,Product amount,Received amount,Payment time,Cash,Gcash,Type/Channel"
    Files.write(Paths.get(staging, "day1.csv"), (header +
      "\n1,Spanish Latte (Solo) (Hot) x2,100.00,100.00,t1,100.00,-,Dine-in").getBytes("UTF-8"))

    // Derby reserves SIZE as a keyword — rename through the seam's
    // own projection before the sink (sinkReady sanitizes the rest)
    val jdbc = new graft.etl.JdbcUpsertSink(url, "pos_fact",
      dialect = UpsertDialect.UpdateInsert)
    val renaming = new graft.etl.UpsertSink {
      def upsert(batch: org.apache.spark.sql.DataFrame, keys: Seq[String]): Unit =
        jdbc.upsert(batch.withColumnRenamed("size", "size_").coalesce(1), keys)
    }
    Ingest.ingestAvailableNowTo(spark, staging, base + "/archive", base + "/chk",
      renaming, base + "/quar", Transform.dimDF(spark))

    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT order_id, items, quantity FROM pos_fact ORDER BY order_id")
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
      while (rs.next()) buf += ((rs.getString(1), rs.getString(2), rs.getDouble(3)))
      assert(buf.toSeq === Seq(("1", "Spanish Latte", 2.0)))
    } finally c.close()
  }
}
