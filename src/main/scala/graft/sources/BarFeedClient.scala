package graft.sources

import graft.sources.PagedProviderSource.ProviderRecord
import org.json4s._

/** Concrete minute-bar feed client for the common vendor dialect (ref:
  * ingestion/infrastructure/alpaca_client.py:19-61): symbols/start/end
  * query params, `page_token` cursor, bars keyed per symbol as
  * `{"bars": {"SYM": [{"t": epochNs, "o","h","l","c","v"}]},
  *   "next_page_token": ...}`.
  *
  * Timestamps on the wire are epoch nanoseconds (integer), avoiding ISO
  * parse ambiguity at the edge; the anti-corruption translate drops
  * malformed rows.
  */
final class BarFeedClient(
    config: ClientConfig,
    auth: AuthStrategy,
    http: HttpClient,
    rateLimiter: Option[TokenBucket] = None,
    state: ClientState = ClientState.Noop,
    metrics: (String, Double) => Unit = (_, _) => (),
    sleepMs: Long => Unit = Thread.sleep(_))
  extends PagedApiClient(config, auth, http, rateLimiter, state, metrics, sleepMs) {

  def endpointPath(symbol: String): String = "/v2/bars"

  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String] = {
    val base = Map(
      "symbols" -> symbol,
      "timeframe" -> "1Min",
      "start" -> startNs.toString,
      "end" -> endNs.toString,
      "limit" -> config.pageLimit.toString)
    cursor.fold(base)(c => base + ("page_token" -> c))
  }

  def nextCursor(page: JValue): Option[String] =
    page \ "next_page_token" match {
      case JString(s) if s.nonEmpty => Some(s)
      case _ => None
    }

  def parsePage(page: JValue): Seq[ProviderRecord] =
    page \ "bars" match {
      case JObject(bySymbol) =>
        bySymbol.flatMap {
          case (sym, JArray(bars)) =>
            bars.map { b =>
              ProviderRecord(
                symbol = sym,
                timestampNs = num(b \ "t"),
                open = dbl(b \ "o"), high = dbl(b \ "h"),
                low = dbl(b \ "l"), close = dbl(b \ "c"),
                volume = num(b \ "v"))
            }
          case _ => Nil
        }
      case _ => Nil
    }

  private def num(v: JValue): Option[Long] = v match {
    case JInt(i) => Some(i.toLong)
    case JLong(l) => Some(l)
    case JDouble(d) => Some(d.toLong)
    case _ => None
  }
  private def dbl(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }
}

/** Provider registry (ref: ingestion/infrastructure/provider_registry.py:
  * 15-135): name -> client factory, with built-ins pre-registered. The
  * Scala analogue of entry-point discovery is plain registration — callers
  * add vendors at startup.
  */
object ProviderRegistry {
  type Factory = (ClientConfig, AuthStrategy, HttpClient) => PagedApiClient

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, (Factory, Boolean)]

  register("barfeed", (cfg, auth, http) => new BarFeedClient(cfg, auth, http))
  register("iex", (cfg, auth, http) => new IexBarFeed(cfg, auth, http))
  register("finnhub", (cfg, auth, http) => new FinnhubBarFeed(cfg, auth, http))
  register("polygon", (cfg, auth, http) => new PolygonBarFeed(cfg, auth, http))
  register("fake", (cfg, auth, _) =>
    new BarFeedClient(cfg, auth, new FakeBarServer(nBars = 390, pageSize = 100)),
    needsEndpoint = false)

  /** `needsEndpoint = false` marks dialects that wrap an in-process wire
    * server (the fake/test seams) and therefore need no `baseUrl`; real
    * HTTP dialects keep the default so a read that forgot its endpoint
    * fails at planning time instead of on every executor.
    */
  def register(name: String, factory: Factory,
               needsEndpoint: Boolean = true): Unit =
    registry.put(name, (factory, needsEndpoint))
  def get(name: String): Option[Factory] = registry.get(name).map(_._1)
  def needsEndpoint(name: String): Boolean = registry.get(name).exists(_._2)
  def list(): Seq[String] = registry.keys.toSeq.sorted
}

/** Deterministic in-process bar server speaking the [[BarFeedClient]] wire
  * dialect (the test seam; ref: fake_adapter.py + the fake HTTP clients in
  * the reference's client tests). Bars are pure integer arithmetic of the
  * bar index, so any engine can recompute the expected aggregate:
  *   ts_ns  = i * 60_000_000_000
  *   close  = (10000 + (i * 37) % 5000) / 100.0   (2dp-exact)
  *   open   = (10000 + ((i + 1) * 37) % 5000) / 100.0
  *   high   = max(open, close) + 0.5, low = min(open, close) - 0.5
  *   volume = (i * 7919) % 997 + 1
  * Pages carry `pageSize` bars; `next_page_token` is the next start index.
  * `failFirstN` > 0 makes the first N requests fail with `failStatus`
  * (retry-path testing); `retryAfterSec` >= 0 adds a Retry-After header.
  */
final class FakeBarServer(
    nBars: Int,
    pageSize: Int,
    failFirstN: Int = 0,
    failStatus: Int = 500,
    retryAfterSec: Long = -1L,
    failAtRequest: Int = -1) extends HttpClient {

  val requests = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String], Map[String, String])]
  private var failures = failFirstN

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = synchronized {
    requests += ((url, params, headers))
    if (requests.length == failAtRequest)
      return HttpResponse(404, Map.empty, """{"error":"hard failure"}""")
    if (failures > 0) {
      failures -= 1
      val hdrs = if (retryAfterSec >= 0) Map("Retry-After" -> retryAfterSec.toString)
                 else Map.empty[String, String]
      return HttpResponse(failStatus, hdrs, """{"error":"transient"}""")
    }
    val symbol = params.getOrElse("symbols", "TEST")
    val start = params.get("page_token").flatMap(_.toIntOption).getOrElse(0)
    val end = (start + pageSize).min(nBars)
    val bars = (start until end).map { i =>
      val close = (10000 + (i * 37) % 5000) / 100.0
      val open = (10000 + ((i + 1) * 37) % 5000) / 100.0
      val high = math.max(open, close) + 0.5
      val low = math.min(open, close) - 0.5
      val vol = (i.toLong * 7919L) % 997L + 1L
      s"""{"t":${i.toLong * 60000000000L},"o":$open,"h":$high,"l":$low,"c":$close,"v":$vol}"""
    }.mkString(",")
    val token = if (end < nBars) s""""$end"""" else "null"
    HttpResponse(200, Map.empty,
      s"""{"bars":{"$symbol":[$bars]},"next_page_token":$token}""")
  }
}
