package graft.sources.rest

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper

/** Typed API failures, mirroring the reference's status mapping
  * (/root/reference/dags/API_IPN.py:32-44): 400 = request validation, 401 =
  * API-key auth, 5xx = server side. Callers (e.g. runner retry loops,
  * dead-letter routing) can react per class instead of string-matching.
  */
final class ApiValidationException(msg: String) extends RuntimeException(msg)
final class ApiAuthenticationException(msg: String) extends RuntimeException(msg)
final class ApiServerException(msg: String) extends RuntimeException(msg)

/** Real HTTP transport for [[PageFetcher]] over `java.net.http.HttpClient`
  * (JDK-native, no new dependency).
  *
  * Request shape follows the reference client
  * (/root/reference/dags/API_IPN.py:78-129): GET `baseUrl?offset=<page>&
  * limit=<pageSize>&<params...>` with `Authorization: Bearer <apiKey>`;
  * response envelope `{"Response": {"Results": [...]}}`, each element
  * returned as a raw JSON string (pipelines apply `from_json` with their
  * entity schema). 200 with empty `Results` is the end-of-data signal.
  *
  * Departure from the reference: transient failures (5xx, connect/read
  * errors) retry with exponential backoff instead of killing the whole
  * extract — on a 1000-executor fan-out a single flaky page must not fail
  * the stage. 400/401 never retry; they are deterministic.
  *
  * Serializable for shipping inside tasks: the HttpClient is `@transient
  * lazy`, built once per executor JVM.
  */
class HttpPageFetcher(baseUrl: String, apiKey: String = "",
                      maxRetries: Int = 3, retryBackoffMs: Long = 200L,
                      requestTimeoutMs: Long = 30000L) extends PageFetcher {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(requestTimeoutMs)).build()
  @transient private lazy val mapper = new ObjectMapper()

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)

  override def fetch(page: Int, pageSize: Int, params: Map[String, String]): Seq[String] = {
    val qs = (params ++ Map("offset" -> page.toString, "limit" -> pageSize.toString))
      .toSeq.sortBy(_._1).map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val req = {
      val b = HttpRequest.newBuilder(URI.create(s"$baseUrl?$qs"))
        .timeout(Duration.ofMillis(requestTimeoutMs)).GET()
      (if (apiKey.nonEmpty) b.header("Authorization", s"Bearer $apiKey") else b).build()
    }
    var attempt = 0
    while (true) {
      val outcome: Either[String, Seq[String]] =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => Right(parseResults(resp.body()))
            case 400 => throw new ApiValidationException(
              s"request validation failed for page $page: ${resp.body().take(500)}")
            case 401 => throw new ApiAuthenticationException(
              "API key authentication was not successful")
            case s if s >= 500 => Left(s"server error $s")
            // rate-limit / request-timeout are transient by definition —
            // the parallel page fan-out is exactly what provokes 429s
            case s @ (408 | 429) => Left(s"transient status $s")
            case s => throw new ApiServerException(s"unexpected status $s for page $page")
          }
        } catch {
          case e: java.io.IOException => Left(s"transport error: ${e.getMessage}")
        }
      outcome match {
        case Right(rows) => return rows
        case Left(why) if attempt < maxRetries =>
          Thread.sleep(retryBackoffMs << attempt) // 200, 400, 800, ...
          attempt += 1
        case Left(why) =>
          throw new ApiServerException(s"page $page failed after ${attempt + 1} attempts: $why")
      }
    }
    Nil // unreachable
  }

  /** Extract Response.Results elements as raw JSON strings; a missing or
    * non-array Results reads as the empty page (end-of-data), matching the
    * reference's NoRecords handling.
    */
  private[rest] def parseResults(body: String): Seq[String] = {
    val results = mapper.readTree(body).path("Response").path("Results")
    if (!results.isArray) Nil
    else (0 until results.size()).map(i => mapper.writeValueAsString(results.get(i)))
  }
}
