package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Driver-side HTTP snapshot source (SURVEY §2.1 S1; reference
  * raw_all.py:74-77: GET with 30 s timeout + raise_for_status) with
  * bounded-backoff retry (§2.11: RetryPresets.API_CALL — 3 attempts,
  * 0.5 s base, 10 s cap; retry/decorators.py:601-607).
  *
  * Not a Spark scan: one fetch produces one raw payload, which then enters
  * the engine through the text sink + file source (S4/S5). The retry loop
  * is deliberately tiny — Spark's task retry covers everything after
  * ingestion.
  */
object HttpSource {

  final case class RetryConfig(
      attempts: Int = 3,
      baseDelayMs: Long = 500,
      capDelayMs: Long = 10000)

  final class HttpFetchException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  /** GET with status check; non-2xx → exception (raise_for_status). */
  def fetchOnce(url: String, timeoutSec: Int = 30): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSec)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new HttpFetchException(s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }

  /** Exponential backoff: delay = min(base · 2^attempt, cap). When a
    * breaker is supplied, every attempt runs under it and an OPEN circuit
    * fails fast (no retry — rejecting immediately is the breaker's point;
    * reference retry/circuit_breaker.py state machine).
    */
  def fetchWithRetry(url: String, cfg: RetryConfig = RetryConfig(),
                     fetch: String => String = fetchOnce(_),
                     breaker: Option[CircuitBreaker] = None): String = {
    var last: Throwable = null
    (0 until cfg.attempts).foreach { attempt =>
      try return breaker match {
        case Some(b) => b.call(fetch(url))
        case None => fetch(url)
      }
      catch {
        case e: CircuitBreaker.CircuitOpenException => throw e
        case e: Exception =>
          last = e
          if (attempt < cfg.attempts - 1) {
            val delay = math.min(cfg.baseDelayMs << attempt, cfg.capDelayMs)
            Thread.sleep(delay)
          }
      }
    }
    throw new HttpFetchException(s"fetch failed after ${cfg.attempts} attempts", last)
  }
}
