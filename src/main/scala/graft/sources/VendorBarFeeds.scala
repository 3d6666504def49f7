package graft.sources

import graft.sources.PagedProviderSource.ProviderRecord
import org.json4s._

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Vendor wire-dialect clients (SURVEY §2.1 S13 breadth). Each is a thin
  * subclass of [[PagedApiClient]] defining only the vendor's endpoint,
  * query parameters, cursor style, and page shape — the cross-cutting
  * machinery (rate limiting, retry/backoff, Retry-After, auth, metrics,
  * checkpoints) lives in the base. Mirrors the reference's per-vendor
  * anti-corruption adapters:
  *   - iex_adapter.py:90-213      (intraday-prices, date+minute rows)
  *   - finnhub_adapter.py:56-350  (stock/candle, columnar arrays)
  *   - polygon_adapter.py:56-436  (aggs range path, next_url cursor)
  */
object VendorBarFeeds {

  private[sources] def num(v: JValue): Option[Long] = v match {
    case JInt(i) => Some(i.toLong)
    case JLong(l) => Some(l)
    case JDouble(d) => Some(d.toLong)
    case _ => None
  }
  private[sources] def dbl(v: JValue): Option[Double] = v match {
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }
  private[sources] def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }
  private[sources] def utcDate(ns: Long): LocalDate =
    Instant.ofEpochSecond(ns / 1000000000L).atOffset(ZoneOffset.UTC).toLocalDate
}

/** IEX-cloud-style dialect (ref: iex_adapter.py:90-213): GET
  * `/stock/{symbol}/intraday-prices?token=..&chartByDay=true&exactDate=..`,
  * one un-paginated JSON array of rows carrying split `date` ("yyyy-MM-dd")
  * and `minute` ("HH:mm") fields that combine into a UTC minute timestamp.
  * The token rides as a query param (`AuthStrategy.QueryTokenAuth("token",..)`).
  */
final class IexBarFeed(
    config: ClientConfig,
    auth: AuthStrategy,
    http: HttpClient,
    rateLimiter: Option[TokenBucket] = None,
    state: ClientState = ClientState.Noop,
    metrics: (String, Double) => Unit = (_, _) => (),
    sleepMs: Long => Unit = Thread.sleep(_))
  extends PagedApiClient(config, auth, http, rateLimiter, state, metrics, sleepMs) {

  import VendorBarFeeds._

  private val minuteFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")

  def endpointPath(symbol: String): String = s"/stock/$symbol/intraday-prices"

  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String] =
    Map(
      "chartByDay" -> "true",
      "exactDate" -> utcDate(startNs).toString)

  /** IEX intraday-prices is single-shot — no pagination cursor. */
  def nextCursor(page: JValue): Option[String] = None

  def parsePage(page: JValue): Seq[ProviderRecord] = page match {
    case JArray(rows) =>
      rows.map { b =>
        val ts = for {
          d <- str(b \ "date")
          m <- str(b \ "minute")
          parsed <- try Some(LocalDateTime.parse(s"$d $m", minuteFmt))
                    catch { case _: Exception => None }
        } yield parsed.toEpochSecond(ZoneOffset.UTC) * 1000000000L
        ProviderRecord(
          symbol = "",
          timestampNs = ts,
          open = dbl(b \ "open"), high = dbl(b \ "high"),
          low = dbl(b \ "low"), close = dbl(b \ "close"),
          volume = num(b \ "volume"))
      }
    case _ => Nil
  }

}

/** Finnhub-style dialect (ref: finnhub_adapter.py:56-350): GET
  * `/stock/candle?symbol=..&resolution=1&from=sec&to=sec&token=..`, one
  * columnar JSON page `{"s":"ok","t":[sec..],"o":[..],"h":[..],"l":[..],
  * "c":[..],"v":[..]}`; `"s":"no_data"` means an empty range (not an
  * error). Rows are truncated to the shortest column (the reference's
  * min-length zip). 401/403 surface as non-retryable failures via the base.
  */
final class FinnhubBarFeed(
    config: ClientConfig,
    auth: AuthStrategy,
    http: HttpClient,
    rateLimiter: Option[TokenBucket] = None,
    state: ClientState = ClientState.Noop,
    metrics: (String, Double) => Unit = (_, _) => (),
    sleepMs: Long => Unit = Thread.sleep(_),
    resolution: String = "1")
  extends PagedApiClient(config, auth, http, rateLimiter, state, metrics, sleepMs) {

  import VendorBarFeeds._

  def endpointPath(symbol: String): String = "/stock/candle"

  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String] =
    Map(
      "symbol" -> symbol,
      "resolution" -> resolution,
      "from" -> (startNs / 1000000000L).toString,
      "to" -> (endNs / 1000000000L).toString)

  /** Candle responses are single-shot — no pagination cursor. */
  def nextCursor(page: JValue): Option[String] = None

  def parsePage(page: JValue): Seq[ProviderRecord] =
    str(page \ "s") match {
      case Some("no_data") => Nil
      case Some("ok") =>
        def arr(k: String): List[JValue] = page \ k match {
          case JArray(xs) => xs; case _ => Nil
        }
        val (ts, os, hs, ls, cs, vs) =
          (arr("t"), arr("o"), arr("h"), arr("l"), arr("c"), arr("v"))
        val n = Seq(ts, os, hs, ls, cs, vs).map(_.length).min
        (0 until n).map { i =>
          ProviderRecord(
            symbol = "",
            timestampNs = num(ts(i)).map(_ * 1000000000L),
            open = dbl(os(i)), high = dbl(hs(i)),
            low = dbl(ls(i)), close = dbl(cs(i)),
            volume = num(vs(i)))
        }
      case other =>
        throw new RuntimeException(
          s"candle feed returned status: ${other.getOrElse("unknown")}")
    }

}

/** Polygon-style dialect (ref: polygon_adapter.py:56-436): GET
  * `/v2/aggs/ticker/{sym}/range/{mult}/{span}/{from}/{to}?adjusted=true&
  * sort=asc&limit=..&apikey=..` — the time range rides in the URL PATH as
  * dates; pages carry `{"status":"OK","results":[{"t":ms,"o","h","l","c",
  * "v","n","vw"}],"next_url":"...cursor=XYZ..."}` and the next-page cursor
  * is extracted from `next_url`'s `cursor=` query fragment. A 200 body
  * with `"status":"ERROR"` is a non-retryable API error.
  */
final class PolygonBarFeed(
    config: ClientConfig,
    auth: AuthStrategy,
    http: HttpClient,
    rateLimiter: Option[TokenBucket] = None,
    state: ClientState = ClientState.Noop,
    metrics: (String, Double) => Unit = (_, _) => (),
    sleepMs: Long => Unit = Thread.sleep(_),
    multiplier: Int = 1,
    timespan: String = "minute")
  extends PagedApiClient(config, auth, http, rateLimiter, state, metrics, sleepMs) {

  import VendorBarFeeds._

  def endpointPath(symbol: String): String =
    s"/v2/aggs/ticker/$symbol/range/$multiplier/$timespan"

  override def endpointPathFor(symbol: String, startNs: Long, endNs: Long): String =
    s"${endpointPath(symbol)}/${utcDate(startNs)}/${utcDate(endNs)}"

  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String] = {
    val base = Map(
      "adjusted" -> "true",
      "sort" -> "asc",
      "limit" -> config.pageLimit.toString)
    cursor.fold(base)(c => base + ("cursor" -> c))
  }

  /** `next_url` carries the cursor as a query fragment (ref:
    * polygon_adapter.py:154-162 splits on "cursor=").
    */
  def nextCursor(page: JValue): Option[String] =
    str(page \ "next_url").flatMap { u =>
      val i = u.indexOf("cursor=")
      if (i < 0) None
      else {
        val tail = u.substring(i + "cursor=".length)
        val amp = tail.indexOf('&')
        Some(if (amp < 0) tail else tail.substring(0, amp)).filter(_.nonEmpty)
      }
    }

  def parsePage(page: JValue): Seq[ProviderRecord] = {
    if (str(page \ "status").contains("ERROR"))
      throw new RuntimeException("aggregates API error: " +
        str(page \ "error").getOrElse("unknown"))
    page \ "results" match {
      case JArray(rows) =>
        rows.map { b =>
          ProviderRecord(
            symbol = "",
            timestampNs = num(b \ "t").map(_ * 1000000L), // wire is epoch ms
            open = dbl(b \ "o"), high = dbl(b \ "h"),
            low = dbl(b \ "l"), close = dbl(b \ "c"),
            volume = num(b \ "v"))
        }
      case _ => Nil
    }
  }

}

/** Shared deterministic bar math for the vendor fake servers: bar i is
  *   ts     = baseEpochSec + 60*i   (2024-01-02T00:00Z by default)
  *   close  = (10000 + (i*37)%5000) / 100.0
  *   open   = (10000 + ((i+1)*37)%5000) / 100.0
  *   high/low = max/min(open, close) +/- 0.5
  *   volume = (i*7919)%997 + 1
  * — integer arithmetic any engine reproduces exactly (same formula as
  * [[FakeBarServer]], shifted to a real epoch so date-path dialects work).
  */
object VendorFakeBars {
  val BaseEpochSec: Long = 1704153600L // 2024-01-02T00:00:00Z

  def tsSec(i: Int): Long = BaseEpochSec + 60L * i
  def close(i: Int): Double = (10000 + (i * 37) % 5000) / 100.0
  def open(i: Int): Double = (10000 + ((i + 1) * 37) % 5000) / 100.0
  def high(i: Int): Double = math.max(open(i), close(i)) + 0.5
  def low(i: Int): Double = math.min(open(i), close(i)) - 0.5
  def volume(i: Int): Long = (i.toLong * 7919L) % 997L + 1L
}

/** Deterministic in-process server speaking the [[IexBarFeed]] wire shape:
  * one flat JSON array with split date/minute fields, no pagination.
  */
final class FakeIexServer(nBars: Int) extends HttpClient {
  import VendorFakeBars._
  val requests = scala.collection.mutable.ArrayBuffer
    .empty[(String, Map[String, String], Map[String, String])]

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = synchronized {
    requests += ((url, params, headers))
    if (!params.contains("token"))
      return HttpResponse(401, Map.empty, """{"error":"missing token"}""")
    val rows = (0 until nBars).map { i =>
      val t = java.time.Instant.ofEpochSecond(tsSec(i))
        .atOffset(java.time.ZoneOffset.UTC)
      val date = t.toLocalDate.toString
      val minute = f"${t.getHour}%02d:${t.getMinute}%02d"
      s"""{"date":"$date","minute":"$minute","open":${open(i)},"high":${high(i)},""" +
        s""""low":${low(i)},"close":${close(i)},"volume":${volume(i)},"numberOfTrades":${i % 50 + 1}}"""
    }.mkString(",")
    HttpResponse(200, Map.empty, s"[$rows]")
  }
}

/** Deterministic in-process server speaking the [[FinnhubBarFeed]] columnar
  * wire shape; an empty requested range answers `{"s":"no_data"}`.
  */
final class FakeFinnhubServer(nBars: Int) extends HttpClient {
  import VendorFakeBars._
  val requests = scala.collection.mutable.ArrayBuffer
    .empty[(String, Map[String, String], Map[String, String])]

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = synchronized {
    requests += ((url, params, headers))
    if (!params.contains("token"))
      return HttpResponse(401, Map.empty, """{"error":"missing token"}""")
    val from = params.get("from").flatMap(_.toLongOption).getOrElse(0L)
    val to = params.get("to").flatMap(_.toLongOption).getOrElse(Long.MaxValue)
    val idx = (0 until nBars).filter(i => tsSec(i) >= from && tsSec(i) <= to)
    if (idx.isEmpty) return HttpResponse(200, Map.empty, """{"s":"no_data"}""")
    def col(f: Int => Any): String = idx.map(f).mkString("[", ",", "]")
    HttpResponse(200, Map.empty,
      s"""{"s":"ok","t":${col(tsSec)},"o":${col(open)},"h":${col(high)},""" +
        s""""l":${col(low)},"c":${col(close)},"v":${col(volume)}}""")
  }
}

/** Deterministic in-process server speaking the [[PolygonBarFeed]] wire
  * shape: range-in-path URL, `results` objects with epoch-ms `t`, and
  * `next_url`-embedded cursor pagination.
  */
final class FakePolygonServer(nBars: Int, pageSize: Int) extends HttpClient {
  import VendorFakeBars._
  val requests = scala.collection.mutable.ArrayBuffer
    .empty[(String, Map[String, String], Map[String, String])]

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = synchronized {
    requests += ((url, params, headers))
    if (!params.contains("apikey"))
      return HttpResponse(200, Map.empty,
        """{"status":"ERROR","error":"missing apikey"}""")
    val start = params.get("cursor").flatMap(_.toIntOption).getOrElse(0)
    val end = (start + pageSize).min(nBars)
    val rows = (start until end).map { i =>
      s"""{"t":${tsSec(i) * 1000L},"o":${open(i)},"h":${high(i)},"l":${low(i)},""" +
        s""""c":${close(i)},"v":${volume(i)},"n":${i % 50 + 1},"vw":${close(i)}}"""
    }.mkString(",")
    val nextUrl =
      if (end < nBars) s""","next_url":"$url?cursor=$end&limit=$pageSize""""
      else ""
    HttpResponse(200, Map.empty,
      s"""{"status":"OK","resultsCount":${end - start},"results":[$rows]$nextUrl}""")
  }
}
