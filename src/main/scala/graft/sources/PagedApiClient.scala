package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Client configuration (ref: ingestion/infrastructure/models.py ClientConfig). */
final case class ClientConfig(
    baseUrl: String,
    apiKey: String = "",
    timeoutMs: Long = 30000L,
    maxRetries: Int = 3,
    backoffBaseMs: Long = 200L,
    backoffCapMs: Long = 30000L,
    userAgent: String = "graft/1.0",
    pageLimit: Int = 10000)

/** Pluggable checkpoint store for per-symbol resume cursors (ref:
  * base_api_client.py save_checkpoint/load_checkpoint). Production wires
  * this to the jobs checkpoint table; tests use an in-memory map.
  */
trait ClientState {
  def set(symbol: String, checkpoint: String): Unit
  def get(symbol: String): Option[String]
}

object ClientState {
  /** No-op default (checkpointing disabled). */
  object Noop extends ClientState {
    def set(symbol: String, checkpoint: String): Unit = ()
    def get(symbol: String): Option[String] = None
  }
  final class InMemory extends ClientState {
    private val m = scala.collection.concurrent.TrieMap.empty[String, String]
    def set(symbol: String, checkpoint: String): Unit = m.put(symbol, checkpoint)
    def get(symbol: String): Option[String] = m.get(symbol)
  }
}

/** Vendor-agnostic paged REST client (SURVEY §2.1 S13; ref:
  * ingestion/infrastructure/base_api_client.py:16-177 and the retry loop
  * of alpaca_client.py:63-145).
  *
  * Subclasses define the vendor dialect (endpoint, params, cursor,
  * parsing, retry policy); this base owns the cross-cutting machinery:
  * rate-limit acquisition, retries with capped exponential backoff,
  * Retry-After honoring on 429, auth application, metrics callbacks and
  * cursor pagination.
  *
  * Everything here is driver-side by design — one job fetches one page
  * stream, and the result immediately becomes a distributed DataFrame via
  * [[PagedProviderSource.toBars]]; a bulk feed should instead land files
  * read by the partitioned scan path.
  */
abstract class PagedApiClient(
    val config: ClientConfig,
    val auth: AuthStrategy,
    val http: HttpClient,
    val rateLimiter: Option[TokenBucket] = None,
    val state: ClientState = ClientState.Noop,
    val metrics: (String, Double) => Unit = (_, _) => (),
    val sleepMs: Long => Unit = Thread.sleep(_)) {

  /** Endpoint path for a symbol (e.g. "/v2/bars"). */
  def endpointPath(symbol: String): String

  /** Endpoint path when the vendor encodes the time range in the URL path
    * (e.g. the aggregates-range dialect); defaults to the plain path.
    */
  def endpointPathFor(symbol: String, startNs: Long, endNs: Long): String =
    endpointPath(symbol)

  /** Vendor query parameters for one page request. */
  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String]

  /** Extract the next-page cursor, if any. */
  def nextCursor(page: JValue): Option[String]

  /** Parse one raw JSON page into loosely-typed provider records. */
  def parsePage(page: JValue): Seq[PagedProviderSource.ProviderRecord]

  /** Retry policy: 429 and transient server errors by default. */
  def shouldRetry(status: Int, body: JValue): Boolean =
    status == 429 || status >= 500

  /** Capped exponential backoff: base * 2^(attempt-1), no RNG — the
    * deterministic middle of the reference's jittered backoff.
    */
  def backoffMs(attempt: Int): Long =
    (config.backoffBaseMs << (attempt - 1).min(20)).min(config.backoffCapMs)

  final def saveCheckpoint(symbol: String, checkpoint: String): Unit =
    state.set(symbol, checkpoint)
  final def loadCheckpoint(symbol: String): Option[String] = state.get(symbol)

  /** One rate-limited, retried GET returning parsed JSON. */
  final def request(symbol: String, params: Map[String, String]): JValue =
    requestPath(endpointPath(symbol), params)

  /** As [[request]] but against an explicit endpoint path. */
  final def requestPath(path: String, params: Map[String, String]): JValue = {
    rateLimiter.foreach(_.acquire())
    val url = config.baseUrl + path
    val baseHeaders = Map(
      "Accept" -> "application/json", "User-Agent" -> config.userAgent)
    val (headers, authedParams) = auth.apply(baseHeaders, params)
    var attempt = 0
    while (true) {
      val t0 = System.nanoTime()
      val r = http.get(url, authedParams, headers, config.timeoutMs)
      metrics("provider_request_latency_ms", (System.nanoTime() - t0) / 1e6)
      metrics("provider_requests", 1.0)
      if (r.status >= 400) metrics(s"provider_errors_${r.status}", 1.0)
      val parsed: Either[Throwable, JValue] =
        try Right(JsonMethods.parse(r.body))
        catch { case e: Throwable => Left(e) }
      parsed match {
        case Right(json) if !shouldRetry(r.status, json) && r.status < 400 =>
          return json
        case _ if !shouldRetry(r.status, parsed.getOrElse(JNothing)) =>
          throw new RuntimeException(graft.security.Mask.safeForLog(
            s"provider request failed: status=${r.status} body=${r.body.take(200)}",
            (config.apiKey +: auth.secrets): _*))
        case _ => // retryable
          if (r.status == 429) {
            r.header("Retry-After").flatMap(_.toLongOption).foreach { sec =>
              rateLimiter.foreach(_.notifyRetryAfter(sec))
            }
          }
          attempt += 1
          if (attempt > config.maxRetries)
            throw new RuntimeException(graft.security.Mask.safeForLog(
              s"provider request exceeded ${config.maxRetries} retries: " +
                s"status=${r.status} body=${r.body.take(200)}",
              (config.apiKey +: auth.secrets): _*))
          sleepMs(backoffMs(attempt))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Cursor-driven page iterator (ref: base_api_client.py:75-100). With
    * `resume`, the first request starts from the symbol's saved checkpoint
    * cursor (a previous run's last emitted next-page token) instead of the
    * beginning; the checkpoint is cleared on successful exhaustion so a
    * later fresh fetch starts over.
    */
  final def paginate(symbol: String, startNs: Long, endNs: Long,
                     resume: Boolean = false): Iterator[JValue] =
    new Iterator[JValue] {
      private var cursor: Option[String] =
        if (resume) loadCheckpoint(symbol).filter(_.nonEmpty) else None
      private var exhausted = false
      def hasNext: Boolean = !exhausted
      def next(): JValue = {
        val page = requestPath(endpointPathFor(symbol, startNs, endNs),
          buildParams(symbol, startNs, endNs, cursor))
        cursor = nextCursor(page)
        cursor.foreach(saveCheckpoint(symbol, _))
        if (cursor.isEmpty) { exhausted = true; saveCheckpoint(symbol, "") }
        page
      }
    }

  /** Fetch and parse every page for one (symbol, range). */
  final def fetchBatch(symbol: String, startNs: Long, endNs: Long,
                       resume: Boolean = false)
      : Seq[PagedProviderSource.ProviderRecord] =
    pages(symbol, startNs, endNs, resume).flatten.toSeq

  /** Page stream in [[PagedProviderSource.toBars]] shape. Dialects whose
    * wire rows do not echo the symbol (per-symbol endpoints) parse to an
    * empty symbol; the requested one is stamped on here.
    */
  final def pages(symbol: String, startNs: Long, endNs: Long,
                  resume: Boolean = false)
      : Iterator[Seq[PagedProviderSource.ProviderRecord]] =
    paginate(symbol, startNs, endNs, resume).map(parsePage(_)
      .map(r => if (r.symbol.isEmpty) r.copy(symbol = symbol) else r))
}
