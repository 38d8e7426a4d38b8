package graft.sources.rest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The REST source over REAL localhost HTTP: an in-process
  * `com.sun.net.httpserver` speaks the reference API's envelope
  * ({"Response": {"Results": [...]}}, Bearer auth, offset pagination,
  * status mapping per /root/reference/dags/API_IPN.py:32-44), and
  * [[HttpPageFetcher]] drives it through the DSv2 scan — transport
  * included, nothing in-memory.
  */
class HttpRestSourceSpec extends SparkTestBase with org.scalatest.BeforeAndAfterAll {

  private val goodKey = "k-123"
  private val flakyHits = new AtomicInteger(0)
  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    def query(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").filter(_.nonEmpty)
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> java.net.URLDecoder.decode(v, UTF_8) }
        .toMap

    def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    def page(n: Int, rows: Int): String = {
      val results = (0 until rows).map(i => s"""{"n": ${n * rows + i}}""").mkString(",")
      s"""{"Response": {"Total_records": 15, "Results": [$results]}}"""
    }

    // 3 pages x 5 rows, Bearer-authed, then the empty page
    s.createContext("/api/things", (ex: HttpExchange) => {
      if (Option(ex.getRequestHeaders.getFirst("Authorization"))
            .forall(_ != s"Bearer $goodKey")) respond(ex, 401, """{"error": "auth"}""")
      else {
        val q = query(ex)
        if (q.contains("bad")) respond(ex, 400, """{"error": "bad parameter"}""")
        else {
          val off = q("offset").toInt
          respond(ex, 200, page(off, if (off >= 3) 0 else 5))
        }
      }
    })
    // first hit per page 500s, second succeeds — retry must absorb it
    s.createContext("/api/flaky", (ex: HttpExchange) => {
      if (flakyHits.getAndIncrement() % 2 == 0) respond(ex, 500, "boom")
      else respond(ex, 200, page(query(ex)("offset").toInt, 2))
    })
    s.createContext("/api/always500", (ex: HttpExchange) => respond(ex, 500, "down"))
    s.start()
    s
  }
  private def base = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  test("DSv2 scan over live HTTP: pagination, envelope parse, empty-page stop") {
    FetcherRegistry.register("http-things",
      new HttpPageFetcher(s"$base/api/things", apiKey = goodKey))
    val df = spark.read.format("graft.sources.rest.RestTableProvider")
      .option("fetcher", "http-things")
      .option("totalPages", 10).option("pagesPerPartition", 10)
      .load()
    assert(df.count() == 15) // 3 pages x 5, stopped by the empty page
    val sumN = df.select(sum(get_json_object(col("value"), "$.n").cast("long")))
      .head().getLong(0)
    assert(sumN == (0 until 15).sum)
  }

  test("status mapping is typed: 401 auth, 400 validation (no retry burn)") {
    val badAuth = new HttpPageFetcher(s"$base/api/things", apiKey = "wrong")
    intercept[ApiAuthenticationException] { badAuth.fetch(0, 5, Map.empty) }
    val good = new HttpPageFetcher(s"$base/api/things", apiKey = goodKey)
    intercept[ApiValidationException] { good.fetch(0, 5, Map("bad" -> "1")) }
    // envelope edge cases: missing/non-array Results read as the empty page
    assert(good.parseResults("""{"Response": {"Results": []}}""").isEmpty)
    assert(good.parseResults("""{"unrelated": 1}""").isEmpty)
  }

  test("5xx retries with backoff, then typed server error when persistent") {
    flakyHits.set(0)
    val flaky = new HttpPageFetcher(s"$base/api/flaky", maxRetries = 3, retryBackoffMs = 10L)
    assert(flaky.fetch(0, 2, Map.empty).size == 2) // 500 then 200
    val dead = new HttpPageFetcher(s"$base/api/always500", maxRetries = 2, retryBackoffMs = 10L)
    val e = intercept[ApiServerException] { dead.fetch(0, 2, Map.empty) }
    assert(e.getMessage.contains("after 3 attempts"))
  }

  test("request params travel as query string (API-side predicates)") {
    val echoed = new java.util.concurrent.atomic.AtomicReference[String]("")
    server.createContext("/api/echo", (ex: HttpExchange) => {
      echoed.set(ex.getRequestURI.getRawQuery)
      val bytes = """{"Response": {"Results": []}}""".getBytes(UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    new HttpPageFetcher(s"$base/api/echo")
      .fetch(7, 250, Map("date_from" -> "01/04/2025", "stores" -> "1,2,3"))
    val q = echoed.get()
    assert(q.contains("offset=7") && q.contains("limit=250"))
    assert(q.contains("date_from=01%2F04%2F2025") && q.contains("stores=1%2C2%2C3"))
  }
}
