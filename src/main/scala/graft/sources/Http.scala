package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side HTTP ingestion — the reference's upstream feed GET
  * (`src/services/fetchContact.js:5-11`, axios keyset loop in
  * `controller.js`): fetch a JSON-lines feed page by page with keyset
  * pagination (`after=<lastId>&limit=<n>`) and hand it to Spark as a
  * DataFrame.
  *
  * Scale contract: the keyset loop is inherently sequential (each page's
  * cursor comes from the previous page), so the driver STREAMS each page
  * to a local spool directory — constant driver memory, no line ever
  * parsed driver-side beyond the cursor regex — and Spark then parses
  * the spool as a normal distributed JSON scan (`from_json` semantics,
  * explicit schema, executor-side). In production the spool is an object
  * store prefix and this helper is the "land the feed" step; the
  * partition-planned scale path over the same protocol semantics is the
  * DSv2 [[graft.sources.feed.FeedSource]] (q50), which pushes the keyset
  * predicate into split planning and needs no driver loop.
  */
object Http {

  /** Fetch `pageUrl(afterId, limit)` pages until a short/empty page,
    * spooling each page to disk, then read the spool distributed.
    *
    * @param pageUrl  builds the page URL from (afterId, pageSize)
    * @param schema   explicit schema for the distributed JSON parse
    * @param idField  monotonically increasing keyset field; the last
    *                 line of each page carries the next cursor
    */
  /** Transient-failure policy for the page loop (L6) — the same capped
    * linear backoff as the reference's reconnect strategy
    * (`src/database/redisClient.js:4-16`): attempt `n` sleeps
    * `min(n * 100 ms, 3 s)`, giving up after `maxRetries`. Retryable:
    * connect/IO errors, HTTP 429 and 5xx. Client errors (other 4xx)
    * fail immediately — retrying a bad request can't help.
    */
  private[sources] def sendWithRetry(
      client: HttpClient, req: HttpRequest,
      maxRetries: Int = 10,
      sleep: Long => Unit = Thread.sleep): HttpResponse[String] = {
    var attempt = 0
    while (true) {
      val retryable: Boolean =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          val sc = resp.statusCode()
          if (sc / 100 == 2) return resp
          if (sc == 429 || sc / 100 == 5) true
          else throw new IllegalStateException(
            s"HTTP $sc from ${req.uri} (non-retryable)")
        } catch {
          case _: java.io.IOException => true
        }
      if (retryable) {
        attempt += 1
        if (attempt > maxRetries)
          throw new IllegalStateException(
            s"HTTP fetch failed after $maxRetries retries: ${req.uri}")
        sleep(math.min(attempt * 100L, 3000L))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def fetchKeysetPaginated(
      spark: SparkSession,
      pageUrl: (Long, Int) => String,
      schema: StructType,
      idField: String,
      startAfter: Long = -1L,
      pageSize: Int = 1000,
      maxPages: Int = 100000,
      maxRetries: Int = 10): DataFrame = {
    // tracked for deletion at Caches.releaseAll — the returned
    // DataFrame reads the spool lazily, so it must outlive this call
    val spool = graft.Caches.trackTempDir(
      Files.createTempDirectory("graft_http_spool_"))
    val client = HttpClient.newHttpClient()
    val cursorRe = ("\"" + java.util.regex.Pattern.quote(idField) +
      "\"\\s*:\\s*(-?\\d+)").r

    var after = startAfter
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      val uri = URI.create(pageUrl(after, pageSize))
      val req = HttpRequest.newBuilder(uri).GET().build()
      val resp = sendWithRetry(client, req, maxRetries)
      val lines = resp.body().split('\n').iterator
        .map(_.trim).filter(_.nonEmpty).toArray
      if (lines.isEmpty) done = true
      else {
        writePage(spool, page, lines)
        // FIRST match = the record's top-level keyset field (a later
        // match could be a same-named field nested in the payload)
        after = cursorRe.findFirstMatchIn(lines.last)
          .map(_.group(1).toLong)
          .getOrElse(throw new IllegalStateException(
            s"page $page: no '$idField' cursor in last line"))
        page += 1
        if (lines.length < pageSize) done = true // short page = feed drained
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"feed not drained after maxPages=$maxPages pages " +
          "(raise maxPages, or the cursor is not advancing)")
    spark.read.schema(schema).json(spool.toString)
  }

  private def writePage(spool: Path, page: Int, lines: Array[String]): Unit = {
    val f = Paths.get(spool.toString, f"page$page%06d.jsonl")
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
