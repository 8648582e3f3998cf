package graft

import graft.etl.{JdbcUpsertSink, Postgrest, PostgrestTransport, PostgrestUpsertSink, UpsertDialect}
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

  // ---- PostgREST wire dialect (reference main.py:27-59,473,479) ----

  test("PostgREST payload renders the reference's scrub rules byte-for-byte") {
    // raw reference-shaped headers + a NaN, an Inf, and a null — the
    // exact cases main.py:41-46 scrubs to JSON null
    val df = Seq(
      ("o1", Double.NaN, Some("Dine-in")),
      ("o2", Double.PositiveInfinity, None),
      ("o3", 1.5, Some("Take-out")))
      .toDF("Order ID", "Total/Order-Amount", "Type/Channel")
    val ready = graft.etl.Load.sinkReady(df)
    val body = Postgrest.renderBatch(ready.schema,
      ready.coalesce(1).collect().toSeq.sortBy(_.getString(0)))
    assert(body ===
      """[{"order_id":"o1","total_order_amount":null,"type_channel":"Dine-in"},""" +
      """{"order_id":"o2","total_order_amount":null,"type_channel":null},""" +
      """{"order_id":"o3","total_order_amount":1.5,"type_channel":"Take-out"}]""")
    // the scrub also guards direct renderBatch use (no sinkReady)
    assert(Postgrest.jsonValue(Double.NaN) === "null")
    assert(Postgrest.jsonValue(Double.NegativeInfinity) === "null")
    assert(Postgrest.jsonValue("a\"b\n") === "\"a\\\"b\\n\"")
    assert(Postgrest.upsertUrl("http://h/", "fact_sales2026", Seq("Order ID", "items"))
      === "http://h/rest/v1/fact_sales2026?on_conflict=order_id,items")
  }

  test("PostgrestUpsertSink posts batched upserts + rpc against a live local server") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        requests.add((x.getRequestURI.toString, body,
          Option(x.getRequestHeaders.getFirst("Prefer")).getOrElse("")))
        x.sendResponseHeaders(201, -1)
        x.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val sink = new PostgrestUpsertSink(base, "fact_sales2026", "test-key",
        batchSize = 2)
      val df = Seq(("o1", 1.5), ("o2", Double.NaN), ("o3", 3.5))
        .toDF("Order ID", "amount").coalesce(1)
      sink.upsert(df, Seq("Order ID"))
      sink.rpc("update_final_fact_sales")

      val got = requests.toArray(Array.empty[(String, String, String)]).toSeq
      val (upserts, rpcs) = got.partition(_._1.contains("fact_sales2026"))
      // batchSize=2 over 3 rows in one partition -> exactly 2 POSTs
      assert(upserts.size === 2)
      assert(upserts.forall(_._1 == "/rest/v1/fact_sales2026?on_conflict=order_id"))
      assert(upserts.forall(_._3 == "resolution=merge-duplicates"))
      assert(upserts.map(_._2).sorted === Seq(
        """[{"order_id":"o1","amount":1.5},{"order_id":"o2","amount":null}]""",
        """[{"order_id":"o3","amount":3.5}]"""))
      assert(rpcs === Seq(("/rest/v1/rpc/update_final_fact_sales", "{}", "resolution=merge-duplicates")))
    } finally server.stop(0)
  }

  test("PostgrestUpsertSink fails the job on a non-2xx response, not silently") {
    val sink = new PostgrestUpsertSink("http://unused", "t", "k",
      transport = SinksSpec.DenyTransport)
    val df = Seq(("o1", 1.0)).toDF("order_id", "amount").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      sink.upsert(df, Seq("order_id"))
    }
    assert(e.getMessage.contains("503") ||
      Option(e.getCause).exists(_.getMessage.contains("503")))
  }
}

object SinksSpec {
  /** Top-level (no outer capture) so the executor closure serializes. */
  object DenyTransport extends PostgrestTransport {
    def post(url: String, headers: Seq[(String, String)], body: Array[Byte]): Int = 503
  }
}
