package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Google-Drive-shaped folder connector — the wire form of the
  * reference's ingest boundary (`main.py:412-470`): list the raw
  * folder (`files().list(q="'<folder>' in parents and
  * trashed=false")`), download each hit (`files().get_media(fileId)`
  * = `GET /drive/v3/files/{id}?alt=media`), and archive by parent
  * move (`files().update(fileId, addParents=…, removeParents=…)` =
  * `PATCH /drive/v3/files/{id}?addParents=…&removeParents=…`).
  *
  * Like the Supabase sink ([[graft.etl.Postgrest]]), the HTTP layer
  * is a seam ([[DriveTransport]]): the offline sandbox has no egress,
  * so DriveSpec drives the connector against an in-process recording
  * server and asserts the three request shapes; a deployment points
  * the same connector at `https://www.googleapis.com` with a real
  * OAuth bearer token.
  *
  * Role in the pipeline: the connector SPOOLS files to a local/DFS
  * staging directory and the existing checkpointed file-source ingest
  * ([[graft.streaming.Ingest.ingestAvailableNow]]) consumes the
  * directory. The handoff is crash-safe without distributed
  * transactions: the spool write is an atomic rename, the archive
  * move happens only AFTER the spool write, and a crash between the
  * two re-downloads an already-spooled file (same name — idempotent
  * overwrite) while the streaming checkpoint dedups downstream.
  *
  * Scale notes, deliberately beyond the reference: the listing PAGES
  * (`nextPageToken`/`pageToken` loop — the reference reads one page
  * and silently drops the rest of a large folder), and the connector
  * moves bounded metadata only (ids + names); bytes stream straight
  * to the spool path. The per-file fetch runs driver-side because the
  * reference's cadence is a cron batch of report files; a 100 TB
  * backfill would parallelize the download step by mapping `list`
  * output over executors — the transport and URL builders below are
  * serializable for exactly that reason.
  */
trait DriveTransport extends Serializable {
  /** GET `url`; returns (status, body). */
  def get(url: String, headers: Seq[(String, String)]): (Int, Array[Byte])

  /** PATCH `url` with `body`; returns (status, response body). */
  def patch(url: String, headers: Seq[(String, String)],
            body: Array[Byte]): (Int, Array[Byte])
}

object DriveTransport {
  /** JDK HttpClient transport (built per call — HttpClient is not
    * serializable).
    */
  object Http extends DriveTransport {
    private def send(b: java.net.http.HttpRequest.Builder,
                     headers: Seq[(String, String)]): (Int, Array[Byte]) = {
      headers.foreach { case (k, v) => b.header(k, v) }
      val r = java.net.http.HttpClient.newHttpClient()
        .send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      (r.statusCode(), r.body())
    }

    def get(url: String, headers: Seq[(String, String)]): (Int, Array[Byte]) =
      send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET(),
        headers)

    def patch(url: String, headers: Seq[(String, String)],
              body: Array[Byte]): (Int, Array[Byte]) =
      send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .method("PATCH",
          java.net.http.HttpRequest.BodyPublishers.ofByteArray(body)),
        headers)
  }
}

final case class DriveFile(id: String, name: String)

object DriveSource {
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** The reference's folder query verbatim (`main.py:418`). */
  def folderQuery(folderId: String): String =
    s"'$folderId' in parents and trashed=false"

  def listUrl(baseUrl: String, folderId: String,
              pageToken: Option[String]): String = {
    val base = baseUrl.stripSuffix("/")
    val page = pageToken.map(t => s"&pageToken=${enc(t)}").getOrElse("")
    s"$base/drive/v3/files?q=${enc(folderQuery(folderId))}$page"
  }

  def downloadUrl(baseUrl: String, fileId: String): String =
    s"${baseUrl.stripSuffix("/")}/drive/v3/files/${enc(fileId)}?alt=media"

  def moveUrl(baseUrl: String, fileId: String, fromFolderId: String,
              toFolderId: String): String =
    s"${baseUrl.stripSuffix("/")}/drive/v3/files/${enc(fileId)}" +
      s"?addParents=${enc(toFolderId)}&removeParents=${enc(fromFolderId)}"

  def headers(token: String): Seq[(String, String)] =
    Seq("Authorization" -> s"Bearer $token")
}

final class DriveConnector(baseUrl: String, token: String,
                           transport: DriveTransport = DriveTransport.Http) {
  private def hs = DriveSource.headers(token)

  private def require2xx(status: Int, what: String): Unit =
    require(status >= 200 && status < 300, s"Drive $what returned HTTP $status")

  /** List every non-trashed file in a folder, following
    * `nextPageToken` until exhausted (the one-page reference loop
    * silently truncates large folders — `main.py:419-420`).
    */
  def listFolder(folderId: String): Seq[DriveFile] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = scala.collection.mutable.ArrayBuffer.empty[DriveFile]
    var page: Option[String] = None
    var more = true
    while (more) {
      val (status, body) =
        transport.get(DriveSource.listUrl(baseUrl, folderId, page), hs)
      require2xx(status, s"list of folder $folderId")
      val root = mapper.readTree(body)
      val files = root.path("files")
      (0 until files.size()).foreach { i =>
        out += DriveFile(files.get(i).path("id").asText(),
          files.get(i).path("name").asText())
      }
      val next = root.path("nextPageToken")
      page = if (next.isMissingNode || next.isNull) None else Some(next.asText())
      more = page.isDefined
    }
    out.toSeq
  }

  /** `GET /drive/v3/files/{id}?alt=media` — the file bytes. */
  def download(fileId: String): Array[Byte] = {
    val (status, body) =
      transport.get(DriveSource.downloadUrl(baseUrl, fileId), hs)
    require2xx(status, s"download of $fileId")
    body
  }

  /** Archive move: re-parent the file (`main.py:464-468`). */
  def move(fileId: String, fromFolderId: String, toFolderId: String): Unit = {
    val (status, _) = transport.patch(
      DriveSource.moveUrl(baseUrl, fileId, fromFolderId, toFolderId), hs,
      "{}".getBytes(StandardCharsets.UTF_8))
    require2xx(status, s"move of $fileId")
  }

  /** The reference's fetch loop as a spool step: list the raw folder,
    * stream each file's bytes to `spoolDir/<name>` (atomic
    * temp-file + rename so the streaming file source never sees a
    * half-written file), then archive it in Drive. Returns the
    * spooled files. Crash-safe: spool-then-move means a failure
    * between the two leaves the file listed in the raw folder and the
    * next run re-downloads it onto the identical spool path.
    */
  def fetchToSpool(rawFolderId: String, archiveFolderId: String,
                   spoolDir: String): Seq[DriveFile] = {
    Files.createDirectories(Paths.get(spoolDir))
    val files = listFolder(rawFolderId)
    files.foreach { f =>
      val tmp = Paths.get(spoolDir, s".${f.name}.inprogress")
      Files.write(tmp, download(f.id))
      Files.move(tmp, Paths.get(spoolDir, f.name),
        StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      move(f.id, rawFolderId, archiveFolderId)
    }
    files
  }
}
