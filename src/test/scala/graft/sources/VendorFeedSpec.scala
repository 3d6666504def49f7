package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-vendor wire dialects against their deterministic fake servers:
  * endpoint/param/cursor styles, field maps, timestamp conversions, and
  * the dialect-specific quirks (no_data candles, ERROR-in-200 bodies,
  * next_url cursors, daily-list footers and test-issue filtering).
  */
class VendorFeedSpec extends SparkSpec {

  private val cfg = ClientConfig("http://fake")
  private def noSleep: Long => Unit = _ => ()
  private val t0 = VendorFakeBars.BaseEpochSec * 1000000000L
  private def tN(n: Int) = (VendorFakeBars.BaseEpochSec + 60L * n) * 1000000000L

  test("iex dialect: path-embedded symbol, exactDate param, date+minute timestamps") {
    val server = new FakeIexServer(nBars = 120)
    val client = new IexBarFeed(cfg,
      AuthStrategy.QueryTokenAuth("token", "tk"), server, sleepMs = noSleep)
    val recs = client.fetchBatch("ACME", t0, tN(120))
    assert(recs.length == 120)
    assert(server.requests.length == 1) // single-shot, no pagination
    val (url, params, _) = server.requests.head
    assert(url.endsWith("/stock/ACME/intraday-prices"))
    assert(params.get("exactDate").contains("2024-01-02"))
    assert(params.get("token").contains("tk")) // query-param auth applied
    assert(recs.head.symbol == "ACME") // stamped from request
    assert(recs.head.timestampNs.contains(t0))
    assert(recs(61).timestampNs.contains(t0 + 61L * 60000000000L))
    assert(recs(61).close.contains(VendorFakeBars.close(61)))
  }

  test("finnhub dialect: columnar zip, epoch-second conversion, no_data empties") {
    val server = new FakeFinnhubServer(nBars = 90)
    val client = new FinnhubBarFeed(cfg,
      AuthStrategy.QueryTokenAuth("token", "tk"), server, sleepMs = noSleep)
    val recs = client.fetchBatch("ACME", t0, tN(90))
    assert(recs.length == 90)
    val (_, params, _) = server.requests.head
    assert(params.get("symbol").contains("ACME"))
    assert(params.get("resolution").contains("1"))
    assert(params.get("from").contains(VendorFakeBars.BaseEpochSec.toString))
    assert(recs(5).timestampNs.contains(t0 + 5L * 60000000000L))
    assert(recs(5).volume.contains(VendorFakeBars.volume(5)))
    // a range with no bars answers {"s":"no_data"} -> empty, not an error
    val empty = client.fetchBatch("ACME", 0L, 1000000000L)
    assert(empty.isEmpty)
  }

  test("polygon dialect: range-in-path, next_url cursor pages, epoch-ms conversion") {
    val server = new FakePolygonServer(nBars = 250, pageSize = 100)
    val client = new PolygonBarFeed(cfg.copy(pageLimit = 100),
      AuthStrategy.QueryTokenAuth("apikey", "pk"), server, sleepMs = noSleep)
    val recs = client.fetchBatch("ACME", t0, tN(250))
    assert(recs.length == 250)
    assert(server.requests.length == 3)
    val (url, p1, _) = server.requests.head
    assert(url.contains("/v2/aggs/ticker/ACME/range/1/minute/2024-01-02/"))
    assert(p1.get("adjusted").contains("true") && p1.get("sort").contains("asc"))
    assert(p1.get("cursor").isEmpty)
    assert(server.requests(1)._2.get("cursor").contains("100"))
    assert(server.requests(2)._2.get("cursor").contains("200"))
    assert(recs(7).timestampNs.contains(t0 + 7L * 60000000000L)) // ms -> ns
  }

  test("polygon dialect: HTTP-200 body with status ERROR is a hard failure") {
    val server = new FakePolygonServer(nBars = 10, pageSize = 10)
    // no apikey param -> fake answers {"status":"ERROR",...} with HTTP 200
    val client = new PolygonBarFeed(cfg, AuthStrategy.NoAuth, server, sleepMs = noSleep)
    val e = intercept[RuntimeException](client.fetchBatch("ACME", t0, tN(10)))
    assert(e.getMessage.contains("aggregates API error"))
  }

  test("vendor registry: iex/finnhub/polygon resolve to their dialects") {
    def mk(name: String) = ProviderRegistry.get(name).get
      .apply(cfg, AuthStrategy.NoAuth, new FakeIexServer(1))
    assert(mk("iex").isInstanceOf[IexBarFeed])
    assert(mk("finnhub").isInstanceOf[FinnhubBarFeed])
    assert(mk("polygon").isInstanceOf[PolygonBarFeed])
  }

  test("nasdaq daily list: category map, ETF flag, test-issue skip, footer as-of") {
    val feed = new NasdaqSymbolFeed(cfg, new FakeNasdaqListServer(nSymbols = 60))
    val rows = feed.parse(feed.fetchRaw())
    // i%11==0 skipped: 60 symbols minus ceil(60/11)=6 test issues
    assert(rows.length == 60 - 6)
    assert(rows.forall(_.asOf == "2024-01-02")) // footer date
    val byTicker = rows.map(r => r.ticker -> r).toMap
    assert(!byTicker.contains("AAA")) // i=0 is a test issue
    assert(byTicker("AAB").mic == "XNYS") // i=1, cat N
    assert(byTicker("AAC").mic == "ARCX") // i=2, cat A
    assert(byTicker("AAD").assetClass == "ETF") // i=3, ETF flag
    assert(byTicker("AAN").mic == "XNAS") // i=13, blank category default
    // ETF exclusion config drops the i%4==3 rows
    val noEtf = new NasdaqSymbolFeed(cfg, new FakeNasdaqListServer(60),
      includeEtfs = false)
    assert(noEtf.parse(noEtf.fetchRaw()).forall(_.assetClass == "EQUITY"))
    // test issues kept when configured, as-of override wins over footer
    val keepTest = new NasdaqSymbolFeed(cfg, new FakeNasdaqListServer(60),
      skipTestIssues = false, asOfOverride = Some("2025-06-19"))
    val kt = keepTest.parse(keepTest.fetchRaw())
    assert(kt.length == 60 && kt.head.asOf == "2025-06-19")
  }

  test("polygon symbols: paged fetch, exchange/type/status maps, figi passthrough") {
    val server = new FakePolygonSymbolServer(nSymbols = 130, pageSize = 50)
    val feed = new PolygonSymbolFeed(cfg.copy(pageLimit = 50),
      AuthStrategy.QueryTokenAuth("apikey", "pk"), server, asOf = "2024-01-02")
    val df = feed.fetchSymbols(spark).cache()
    try {
      assert(df.count() == 130)
      val r4 = df.where(col("ticker") === "AAE").head() // i=4
      assert(r4.getAs[String]("mic") == "IEXG") // IEX -> IEXG map
      assert(r4.getAs[String]("asset_class") == "EQUITY") // PFD -> EQUITY
      val r5 = df.where(col("ticker") === "AAF").head() // i=5
      assert(r5.getAs[String]("mic") == "OTCM") // unknown code truncates
      assert(r5.getAs[String]("country") == "US")
      assert(df.where(col("status") === "DELISTED").count() ==
        (0 until 130).count(_ % 9 == 0))
      assert(df.where(col("figi").isNotNull).count() ==
        (0 until 130).count(_ % 3 != 0))
    } finally df.unpersist()
  }
}
