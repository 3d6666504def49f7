package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._

/** Per-vendor symbol-list dialects (SURVEY §2.1 S15 breadth; ref:
  * ingestion/symbol_providers/nasdaq_dl.py:1-260 and polygon.py:1-221).
  * Both land the same canonical snapshot frame — ticker, company_name,
  * mic, asset_class, currency, status, country, figi, as_of — ready for
  * `Normalizer` -> `ScdMerge`, so downstream SCD code is vendor-blind.
  */
object VendorSymbolFeeds {

  /** Canonical symbol-snapshot schema shared by every dialect. */
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("company_name", StringType, nullable = true),
    StructField("mic", StringType, nullable = false),
    StructField("asset_class", StringType, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("country", StringType, nullable = true),
    StructField("figi", StringType, nullable = true),
    StructField("as_of", StringType, nullable = false)))

  final case class SymbolRow(
      ticker: String, companyName: Option[String], mic: String,
      assetClass: String, currency: String, status: String,
      country: Option[String], figi: Option[String], asOf: String)

  def toFrame(spark: SparkSession, rows: Seq[SymbolRow]): DataFrame = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(
      r.ticker, r.companyName.orNull, r.mic, r.assetClass, r.currency,
      r.status, r.country.orNull, r.figi.orNull, r.asOf)).toList)
    spark.createDataFrame(rdd, schema)
  }
}

/** Daily-list symbol dialect (ref: symbol_providers/nasdaq_dl.py:52-260):
  * ONE pipe-delimited text file — header naming the columns, data rows,
  * and a `File Creation Time:  yyyyMMdd` footer that supplies the as-of
  * date when the caller doesn't. Market-category codes map to MICs
  * (Q/G/S -> XNAS, N -> XNYS, A/P -> ARCX, Z -> BATS, blank -> XNAS); the
  * ETF flag picks the asset class; test issues are skipped by default.
  * Not a paged JSON API, so this speaks [[HttpClient]] directly.
  */
final class NasdaqSymbolFeed(
    config: ClientConfig,
    http: HttpClient,
    includeEtfs: Boolean = true,
    skipTestIssues: Boolean = true,
    asOfOverride: Option[String] = None) {

  import VendorSymbolFeeds._

  /** nasdaq_dl.py:52-60 MIC_BY_CAT. */
  private val micByCat = Map(
    "Q" -> "XNAS", "N" -> "XNYS", "A" -> "ARCX",
    "G" -> "XNAS", "S" -> "XNAS", "P" -> "ARCX", "Z" -> "BATS")

  def fetchRaw(): Seq[String] = {
    val r = http.get(config.baseUrl + "/SymbolDirectory/nasdaqlisted.txt",
      Map.empty, Map("User-Agent" -> config.userAgent), config.timeoutMs)
    if (r.status >= 400)
      throw new RuntimeException(s"daily-list download failed: status=${r.status}")
    r.body.linesIterator.toSeq
  }

  /** Footer date with the reference's precedence: explicit override, else
    * the `File Creation Time` footer, else epoch date (deterministic
    * stand-in for "today" — callers in a pipeline always pass as-of).
    */
  private def effectiveAsOf(rows: Seq[String]): String =
    asOfOverride.getOrElse {
      rows.lastOption.map(_.trim).filter(_.startsWith("File Creation Time"))
        .flatMap { footer =>
          val raw = footer.split(":").last.trim
          if (raw.length == 8 && raw.forall(_.isDigit))
            Some(s"${raw.substring(0, 4)}-${raw.substring(4, 6)}-${raw.substring(6)}")
          else None
        }
        .getOrElse("1970-01-01")
    }

  def parse(rows: Seq[String]): Seq[SymbolRow] = {
    if (rows.isEmpty) return Nil
    val header = rows.head.split('|')
    val asOf = effectiveAsOf(rows)
    rows.drop(1)
      .filter(r => r.nonEmpty && !r.startsWith("File Creation Time"))
      .flatMap { line =>
        val parts = line.split('|')
        if (parts.length != header.length) None
        else {
          val data = header.zip(parts).toMap
          val ticker = data.getOrElse("Symbol", "").trim.toUpperCase
          val testIssue = data.getOrElse("Test Issue", "").trim.toUpperCase == "Y"
          val etf = data.getOrElse("ETF", "").trim.toUpperCase == "Y"
          val cat = data.getOrElse("Market Category", "").trim.toUpperCase
          if (ticker.isEmpty || (skipTestIssues && testIssue) ||
              (etf && !includeEtfs)) None
          else Some(SymbolRow(
            ticker = ticker,
            companyName = Some(data.getOrElse("Security Name", "").trim)
              .filter(_.nonEmpty),
            mic = if (cat.isEmpty) "XNAS" else micByCat.getOrElse(cat, "XNAS"),
            assetClass = if (etf) "ETF" else "EQUITY",
            currency = "USD",
            status = "ACTIVE",
            country = Some("US"),
            figi = None,
            asOf = asOf))
        }
      }
  }

  def fetchSymbols(spark: SparkSession): DataFrame =
    toFrame(spark, parse(fetchRaw()))
}

/** Reference-tickers symbol dialect (ref: symbol_providers/polygon.py:
  * 74-221): paged JSON GET `/v3/reference/tickers?market=stocks&limit=..&
  * sort=ticker&order=asc&as_of=..`, `next_url`-embedded cursor; rows map
  * primary-exchange codes to MICs (unknown codes truncate to 4 upper),
  * type codes to asset classes, `active` to ACTIVE/DELISTED, locale to a
  * 2-letter country, and currency to 3 upper. Runs through the full
  * [[PagedApiClient]] machinery (rate limit, retry, auth, checkpoints).
  */
final class PolygonSymbolFeed(
    config: ClientConfig,
    auth: AuthStrategy,
    http: HttpClient,
    rateLimiter: Option[TokenBucket] = None,
    state: ClientState = ClientState.Noop,
    asOf: String = "1970-01-01")
  extends PagedApiClient(config, auth, http, rateLimiter, state) {

  import VendorBarFeeds.str
  import VendorSymbolFeeds._

  /** polygon.py:51-58 MIC_MAP. */
  private val micMap = Map(
    "XNYS" -> "XNYS", "XNAS" -> "XNAS", "ARCX" -> "ARCX",
    "BATS" -> "BATS", "IEX" -> "IEXG")

  /** polygon.py:61-71 ASSET_MAP. */
  private val assetMap = Map(
    "CS" -> "EQUITY", "ADRC" -> "ADR", "ETF" -> "ETF", "REIT" -> "REIT",
    "PFD" -> "EQUITY", "FUND" -> "ETF", "RIGHT" -> "EQUITY",
    "BOND" -> "EQUITY", "WARRANT" -> "EQUITY")

  def endpointPath(symbol: String): String = "/v3/reference/tickers"

  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String] = {
    val base = Map(
      "market" -> "stocks",
      "limit" -> config.pageLimit.toString,
      "sort" -> "ticker",
      "order" -> "asc",
      "as_of" -> asOf)
    cursor.fold(base)(c => base + ("cursor" -> c))
  }

  /** Same next_url cursor fragment as the bar dialect. */
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

  /** Not bar-shaped. */
  def parsePage(page: JValue): Seq[PagedProviderSource.ProviderRecord] = Nil

  def symbolPage(page: JValue): Seq[SymbolRow] = page \ "results" match {
    case JArray(rows) => rows.flatMap { r =>
      str(r \ "ticker").map { t =>
        val exch = str(r \ "primary_exchange").getOrElse("")
        val assetType = str(r \ "type").getOrElse("CS")
        val active = r \ "active" match {
          case JBool(b) => b; case _ => true
        }
        val currency = str(r \ "currency_name")
          .filter(_.nonEmpty).fold("USD")(_.take(3).toUpperCase)
        val country = str(r \ "locale").filter(_.length >= 2)
          .map(_.take(2).toUpperCase)
        SymbolRow(
          ticker = t.toUpperCase,
          companyName = str(r \ "name").filter(_.nonEmpty),
          mic = micMap.getOrElse(exch,
            if (exch.isEmpty) "XNAS" else exch.take(4).toUpperCase),
          assetClass = assetMap.getOrElse(assetType, "EQUITY"),
          currency = currency,
          status = if (active) "ACTIVE" else "DELISTED",
          country = country,
          figi = str(r \ "figi").filter(_.nonEmpty),
          asOf = asOf)
      }
    }
    case _ => Nil
  }

  def fetchSymbols(spark: SparkSession): DataFrame =
    toFrame(spark, paginate("*", 0L, 0L).flatMap(symbolPage).toSeq)
}

/** Deterministic in-process daily-list file server: symbol i has
  *   ticker  = base-26 letters of i (3 chars)
  *   category = Q/N/A/G/S by i%5 (blank when i%13==0 — default-MIC path)
  *   ETF flag = Y when i%4==3, Test Issue = Y when i%11==0
  * plus header and `File Creation Time:  20240102` footer — every field
  * recomputable by another engine from the index alone.
  */
final class FakeNasdaqListServer(nSymbols: Int) extends HttpClient {
  private def ticker(i: Int): String =
    Seq(i / 676 % 26, i / 26 % 26, i % 26).map(d => ('A' + d).toChar).mkString

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = {
    val header = "Symbol|Security Name|Market Category|Test Issue|" +
      "Financial Status|Round Lot Size|ETF|NextShares"
    val rows = (0 until nSymbols).map { i =>
      val cat = if (i % 13 == 0) "" else "QNAGS".charAt(i % 5).toString
      val test = if (i % 11 == 0) "Y" else "N"
      val etf = if (i % 4 == 3) "Y" else "N"
      s"${ticker(i)}|Company ${ticker(i)}|$cat|$test|N|100|$etf|N"
    }
    val body = (header +: rows :+ "File Creation Time:  20240102").mkString("\n")
    HttpResponse(200, Map.empty, body)
  }
}

/** Deterministic in-process reference-tickers server speaking the
  * [[PolygonSymbolFeed]] wire shape with next_url cursor pages: symbol i
  *   primary_exchange = XNAS/XNYS/ARCX/BATS/IEX/OTCM by i%6
  *   type             = CS/ETF/ADRC/REIT/PFD by i%5
  *   active           = i%9 != 0, locale = "us", currency_name = "usd"
  *   figi             = "BBG" + 9 digits when i%3 != 0 else absent
  */
final class FakePolygonSymbolServer(nSymbols: Int, pageSize: Int) extends HttpClient {
  private def ticker(i: Int): String =
    Seq(i / 676 % 26, i / 26 % 26, i % 26).map(d => ('A' + d).toChar).mkString

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = {
    if (!params.contains("apikey"))
      return HttpResponse(401, Map.empty, """{"error":"missing apikey"}""")
    val start = params.get("cursor").flatMap(_.toIntOption).getOrElse(0)
    val end = (start + pageSize).min(nSymbols)
    val exchanges = Seq("XNAS", "XNYS", "ARCX", "BATS", "IEX", "OTCM")
    val types = Seq("CS", "ETF", "ADRC", "REIT", "PFD")
    val rows = (start until end).map { i =>
      val figi = if (i % 3 != 0) s""","figi":"BBG${f"$i%09d"}"""" else ""
      s"""{"ticker":"${ticker(i)}","name":"Company ${ticker(i)}",""" +
        s""""primary_exchange":"${exchanges(i % 6)}","type":"${types(i % 5)}",""" +
        s""""active":${i % 9 != 0},"currency_name":"usd","locale":"us"$figi}"""
    }.mkString(",")
    val nextUrl =
      if (end < nSymbols) s""","next_url":"$url?cursor=$end&limit=$pageSize""""
      else ""
    HttpResponse(200, Map.empty, s"""{"status":"OK","results":[$rows]$nextUrl}""")
  }
}
