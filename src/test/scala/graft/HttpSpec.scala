package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Http

/** Keyset-paginated HTTP ingestion against an in-JVM stub server (the
  * container has no egress; the JDK's HttpServer plays the reference's
  * upstream feed API). Verifies the pagination protocol — `after`
  * cursor honored, short page terminates — and the distributed parse.
  */
class HttpSpec extends SparkSpec {

  private val TotalRows = 2500
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("keyset-paginated fetch drains the feed exactly once") {
    val requests = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val params = Option(ex.getRequestURI.getQuery).getOrElse("")
          .split('&').filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap
        val after = params.getOrElse("after", "-1").toLong
        val limit = params.getOrElse("limit", "1000").toInt
        val rows = ((after + 1) until TotalRows.toLong)
          .take(limit)
          .map(i => s"""{"id":$i,"name":"row_$i","score":${i % 97}.5}""")
        val body = rows.mkString("\n").getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Http.fetchKeysetPaginated(
        spark,
        (after, limit) => s"http://127.0.0.1:$port/feed?after=$after&limit=$limit",
        schema, idField = "id", pageSize = 1000)

      assert(df.count() == TotalRows)
      // ids are exactly 0..TotalRows-1, no dup, no gap, across page splits
      val ids = df.agg(
        min(col("id")), max(col("id")), countDistinct(col("id"))).head()
      assert(ids.getLong(0) == 0L)
      assert(ids.getLong(1) == TotalRows - 1L)
      assert(ids.getLong(2) == TotalRows.toLong)
      // typed parse happened executor-side with the explicit schema
      val r = df.filter(col("id") === 1234).head()
      assert(r.getAs[String]("name") == "row_1234")
      assert(r.getAs[Double]("score") == (1234 % 97) + 0.5)
      // 2500 rows at limit=1000 = 2 full pages + 1 short page; the short
      // page ends the loop without an extra empty-page round trip
      assert(requests.get() == 3)
    } finally server.stop(0)
  }

  test("transient 5xx pages are retried with capped backoff; 4xx is not") {
    val requests = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/flaky", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // every third request succeeds; the two before it fail 500/429
        val n = requests.incrementAndGet()
        if (n % 3 != 0) {
          ex.sendResponseHeaders(if (n % 3 == 1) 500 else 429, -1)
          ex.close()
        } else {
          val params = Option(ex.getRequestURI.getQuery).getOrElse("")
            .split('&').filter(_.contains("=")).map { kv =>
              val Array(k, v) = kv.split("=", 2); k -> v
            }.toMap
          val after = params.getOrElse("after", "-1").toLong
          val rows = ((after + 1) until 250L).take(100)
            .map(i => s"""{"id":$i,"name":"row_$i","score":0.5}""")
          val body = rows.mkString("\n").getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Http.fetchKeysetPaginated(
        spark,
        (after, limit) => s"http://127.0.0.1:$port/flaky?after=$after&limit=$limit",
        schema, idField = "id", pageSize = 100)
      assert(df.count() == 250)
      // 3 logical pages (100+100+50), each costing 3 requests
      assert(requests.get() == 9)
    } finally server.stop(0)
    // non-retryable 4xx: fails immediately, exactly one request
    val reqs4 = new AtomicInteger(0)
    val srv4 = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv4.createContext("/bad", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        reqs4.incrementAndGet()
        ex.sendResponseHeaders(403, -1); ex.close()
      }
    })
    srv4.start()
    try {
      val port = srv4.getAddress.getPort
      val e = intercept[IllegalStateException] {
        Http.fetchKeysetPaginated(
          spark, (a, l) => s"http://127.0.0.1:$port/bad?after=$a&limit=$l",
          schema, idField = "id", pageSize = 100)
      }
      assert(e.getMessage.contains("non-retryable"))
      assert(reqs4.get() == 1)
    } finally srv4.stop(0)
    // retry budget exhausts: a permanently-down endpoint gives up after
    // maxRetries with the backoff schedule, not an infinite loop
    val reqs5 = new AtomicInteger(0)
    val srv5 = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv5.createContext("/down", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        reqs5.incrementAndGet()
        ex.sendResponseHeaders(503, -1); ex.close()
      }
    })
    srv5.start()
    try {
      val port = srv5.getAddress.getPort
      val e = intercept[IllegalStateException] {
        Http.fetchKeysetPaginated(
          spark, (a, l) => s"http://127.0.0.1:$port/down?after=$a&limit=$l",
          schema, idField = "id", pageSize = 100, maxRetries = 2)
      }
      assert(e.getMessage.contains("after 2 retries"))
      assert(reqs5.get() == 3) // initial + 2 retries
    } finally srv5.stop(0)
  }
}
