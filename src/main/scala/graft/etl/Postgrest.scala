package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets

/** PostgREST wire dialect for the upsert sink — the reference's
  * actual load path (`main.py:27-59`: a Supabase PostgREST
  * `upsert(records)` call over HTTP, not raw JDBC). This renders the
  * SAME request the reference's client library produces:
  *
  *   - column names sanitized lower/`' '→'_'`/`'/'→'_'`/`'-'→'_'`
  *     (`main.py:473`);
  *   - body = JSON array of row objects, one key per column;
  *   - every non-finite float (NaN/±Inf) scrubbed to JSON null
  *     BEFORE serialization (`main.py:41-46` — JSON has no literal
  *     for them, and PostgREST rejects bodies that try);
  *   - `POST {base}/rest/v1/{table}?on_conflict=k1,k2` with
  *     `Prefer: resolution=merge-duplicates` — PostgREST's spelling
  *     of latest-wins upsert on the business key;
  *   - the post-load `POST {base}/rest/v1/rpc/{fn}` trigger
  *     (`main.py:479`'s `supabase.rpc(...)`).
  *
  * The HTTP transport is a seam ([[PostgrestTransport]]): the
  * offline sandbox has no egress, so SinksSpec drives the sink
  * against an in-process recording server and asserts payload
  * parity; a deployment points the same sink at a real gateway.
  * Scale shape: identical to [[JdbcUpsertSink]] — each PARTITION
  * posts its own bounded batches executor-side; nothing is collected
  * to the driver, and per-batch cost is independent of target-table
  * size.
  *
  * Float text note: the scrub (what the reference manually
  * implements) is replicated exactly; FINITE doubles print in
  * shortest-roundtrip form on both sides, so values parse back
  * bit-identical even where the decimal spelling could differ.
  */
trait PostgrestTransport extends Serializable {
  /** POST `body` to `url`; returns the HTTP status. */
  def post(url: String, headers: Seq[(String, String)], body: Array[Byte]): Int
}

object PostgrestTransport {
  /** JDK HttpClient transport (executor-side, one client per
    * partition — HttpClient is not serializable, so it is built
    * inside the call).
    */
  object Http extends PostgrestTransport {
    def post(url: String, headers: Seq[(String, String)], body: Array[Byte]): Int = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      headers.foreach { case (k, v) => b.header(k, v) }
      java.net.http.HttpClient.newHttpClient()
        .send(b.build(), java.net.http.HttpResponse.BodyHandlers.discarding())
        .statusCode()
    }
  }
}

object Postgrest {

  /** The reference's header sanitizer (`main.py:473`) — one
    * definition, shared with the sink-ready projection (P2).
    */
  def sanitizeName(c: String): String = Sanitize.sanitizeName(c)

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** One JSON value, applying the reference's non-finite scrub
    * (`main.py:41-46`): a float that is NaN or ±Inf becomes null;
    * everything else serializes by type.
    */
  def jsonValue(v: Any): String = v match {
    case null => "null"
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => if (f.isNaN || f.isInfinite) "null" else f.toString
    case s: String => "\"" + escape(s) + "\""
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case t: java.sql.Timestamp =>
      "\"" + t.toInstant.toString + "\""
    case d: java.sql.Date => "\"" + d.toString + "\""
    case i: java.time.Instant => "\"" + i.toString + "\""
    case d: java.time.LocalDate => "\"" + d.toString + "\""
    case other => "\"" + escape(other.toString) + "\""
  }

  /** JSON array of row objects with sanitized keys — the body shape
    * the reference's `to_dict(orient='records')` + upsert produces.
    */
  def renderBatch(schema: StructType, rows: Seq[Row]): String = {
    val names = schema.fieldNames.map(sanitizeName)
    rows.map { r =>
      names.indices.map { i =>
        "\"" + names(i) + "\":" + jsonValue(r.get(i))
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
  }

  /** The upsert endpoint: `on_conflict` carries the business key,
    * `Prefer: resolution=merge-duplicates` selects upsert (vs the
    * default insert-or-409).
    */
  def upsertUrl(baseUrl: String, table: String, keys: Seq[String]): String = {
    val base = baseUrl.stripSuffix("/")
    val conflict =
      if (keys.isEmpty) ""
      else "?on_conflict=" + keys.map(sanitizeName).mkString(",")
    s"$base/rest/v1/$table$conflict"
  }

  def headers(apiKey: String): Seq[(String, String)] = Seq(
    "apikey" -> apiKey,
    "Authorization" -> s"Bearer $apiKey",
    "Content-Type" -> "application/json",
    "Prefer" -> "resolution=merge-duplicates")
}

/** [[UpsertSink]] over PostgREST: partition-parallel batched POSTs
  * of the reference's exact payload shape. A non-2xx status fails
  * the task (and therefore the job) — half-loaded silence is the
  * one thing an upsert sink must never produce.
  */
final class PostgrestUpsertSink(baseUrl: String, table: String, apiKey: String,
                                transport: PostgrestTransport = PostgrestTransport.Http,
                                batchSize: Int = 500) extends UpsertSink {

  def upsert(batch: DataFrame, keys: Seq[String]): Unit = {
    val ready = Load.sinkReady(batch)
    val schema = ready.schema
    val (b, t, k, tr, bs) = (baseUrl, table, apiKey, transport, batchSize)
    val keySeq = keys
    ready.foreachPartition { (rows: Iterator[Row]) =>
      val url = Postgrest.upsertUrl(b, t, keySeq)
      val hs = Postgrest.headers(k)
      rows.grouped(bs).foreach { group =>
        val body = Postgrest.renderBatch(schema, group)
          .getBytes(StandardCharsets.UTF_8)
        val status = tr.post(url, hs, body)
        require(status >= 200 && status < 300,
          s"PostgREST upsert to $t returned HTTP $status")
      }
    }
  }

  /** The reference's post-load RPC trigger (`main.py:479`):
    * `POST {base}/rest/v1/rpc/{fn}` with an empty-object body.
    */
  def rpc(fn: String): Unit = {
    val status = transport.post(
      s"${baseUrl.stripSuffix("/")}/rest/v1/rpc/$fn",
      Postgrest.headers(apiKey),
      "{}".getBytes(StandardCharsets.UTF_8))
    require(status >= 200 && status < 300,
      s"PostgREST rpc $fn returned HTTP $status")
  }
}
