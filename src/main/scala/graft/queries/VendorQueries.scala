package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vendor-dialect ingest round-trips (SURVEY §2.1 S13/S15 breadth): each
  * query drains a deterministic in-process wire-format server through the
  * real rate-limited retrying client for that vendor dialect, lands a
  * distributed frame, and aggregates; the DuckDB oracle regenerates the
  * same rows from the pure index formulas, so pagination, parsing, field
  * maps, and timestamp conversions are all hash-checked end to end.
  */
object VendorQueries {

  import graft.sources._

  private val baseSec = VendorFakeBars.BaseEpochSec // 2024-01-02T00:00Z
  private def barAgg(df: DataFrame): DataFrame =
    df.groupBy("symbol")
      .agg(count(lit(1)).as("n_bars"),
        sum(col("volume")).as("total_volume"),
        min(col("ts_ns")).as("first_ts"), max(col("ts_ns")).as("last_ts"),
        sum(col("close").cast("decimal(18,2)")).cast("double").as("sum_close"))
      .orderBy("symbol")

  private def barOracle(n: Int): String =
    s"""WITH g AS (SELECT unnest(range(0, $n)) AS i),
       |bars AS (
       |  SELECT 'TEST' AS symbol,
       |         ($baseSec + 60 * i) * 1000000000 AS ts_ns,
       |         (10000 + (i * 37) % 5000) / 100.0 AS close,
       |         (i * 7919) % 997 + 1 AS volume
       |  FROM g)
       |SELECT symbol, count(*) AS n_bars,
       |       CAST(sum(volume) AS BIGINT) AS total_volume,
       |       min(ts_ns) AS first_ts, max(ts_ns) AS last_ts,
       |       CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) AS sum_close
       |FROM bars GROUP BY symbol ORDER BY symbol""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S13/iex: single-shot date+minute dialect; 500 one-minute bars fit the
    // exactDate day. Token rides as the vendor's query param.
    "s13_iex_ingest" -> ((s, dir) => {
      val client = new IexBarFeed(
        ClientConfig("http://fake"),
        AuthStrategy.QueryTokenAuth("token", "test-token"),
        new FakeIexServer(nBars = 500))
      barAgg(PagedProviderSource.ingest(s, client, "TEST",
        baseSec * 1000000000L, (baseSec + 60L * 500) * 1000000000L))
    }),

    // S13/finnhub: columnar candle dialect, epoch-second timestamps.
    "s13_finnhub_ingest" -> ((s, dir) => {
      val client = new FinnhubBarFeed(
        ClientConfig("http://fake"),
        AuthStrategy.QueryTokenAuth("token", "test-token"),
        new FakeFinnhubServer(nBars = 800))
      barAgg(PagedProviderSource.ingest(s, client, "TEST",
        baseSec * 1000000000L, (baseSec + 60L * 800) * 1000000000L))
    }),

    // S13/polygon: range-in-path dialect, epoch-ms timestamps, next_url
    // cursor pagination (1000 bars over 137-bar pages = 8 requests).
    "s13_polygon_ingest" -> ((s, dir) => {
      val client = new PolygonBarFeed(
        ClientConfig("http://fake", pageLimit = 137),
        AuthStrategy.QueryTokenAuth("apikey", "test-key"),
        new FakePolygonServer(nBars = 1000, pageSize = 137))
      barAgg(PagedProviderSource.ingest(s, client, "TEST",
        baseSec * 1000000000L, (baseSec + 60L * 1000) * 1000000000L))
    }),

    // S13/DSv2: the DISTRIBUTED fetch path — spark.read.format
    // ("graft-provider") plans one input partition per symbol; each task
    // drains its symbol's page stream through the registry-resolved
    // dialect client. Three symbols => three parallel fetches.
    "s13_dsv2_distributed_scan" -> ((s, dir) =>
      s.read.format("graft-provider")
        .option("provider", "fake")
        .option("symbols", "AAA,BBB,CCC")
        .option("startNs", "0")
        .option("endNs", (390L * 60000000000L).toString)
        .load()
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_bars"),
          sum(col("volume")).as("total_volume"),
          min(col("ts_ns")).as("first_ts"), max(col("ts_ns")).as("last_ts"),
          sum(col("close").cast("decimal(18,2)")).cast("double").as("sum_close"))
        .orderBy("symbol")),

    // S15/nasdaq: pipe-delimited daily-list parse — category->MIC map,
    // ETF flag, test-issue skip, footer as-of date.
    "s15_nasdaq_symbols" -> ((s, dir) => {
      val feed = new NasdaqSymbolFeed(
        ClientConfig("http://fake"), new FakeNasdaqListServer(nSymbols = 600))
      feed.fetchSymbols(s)
        .groupBy("mic", "asset_class", "as_of")
        .agg(count(lit(1)).as("n"),
          min(col("ticker")).as("min_ticker"), max(col("ticker")).as("max_ticker"))
        .orderBy("mic", "asset_class")
    }),

    // S15/polygon: paged reference-tickers dialect — exchange/type/status
    // field maps, figi passthrough, cursor pagination (700 over 150-pages).
    "s15_polygon_symbols" -> ((s, dir) => {
      val feed = new PolygonSymbolFeed(
        ClientConfig("http://fake", pageLimit = 150),
        AuthStrategy.QueryTokenAuth("apikey", "test-key"),
        new FakePolygonSymbolServer(nSymbols = 700, pageSize = 150),
        asOf = "2024-01-02")
      feed.fetchSymbols(s)
        .groupBy("mic", "asset_class", "status")
        .agg(count(lit(1)).as("n"), count(col("figi")).as("n_figi"),
          min(col("ticker")).as("min_ticker"))
        .orderBy("mic", "asset_class", "status")
    })
  )

  def oracles: Map[String, String] = Map(
    "s13_iex_ingest" -> barOracle(500),
    "s13_finnhub_ingest" -> barOracle(800),
    "s13_polygon_ingest" -> barOracle(1000),
    "s13_dsv2_distributed_scan" ->
      """WITH syms(symbol) AS (VALUES ('AAA'), ('BBB'), ('CCC')),
        |g AS (SELECT unnest(range(0, 390)) AS i),
        |bars AS (
        |  SELECT symbol, i * 60000000000 AS ts_ns,
        |         (10000 + (i * 37) % 5000) / 100.0 AS close,
        |         (i * 7919) % 997 + 1 AS volume
        |  FROM g CROSS JOIN syms)
        |SELECT symbol, count(*) AS n_bars,
        |       CAST(sum(volume) AS BIGINT) AS total_volume,
        |       min(ts_ns) AS first_ts, max(ts_ns) AS last_ts,
        |       CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) AS sum_close
        |FROM bars GROUP BY symbol ORDER BY symbol""".stripMargin,
    "s15_nasdaq_symbols" ->
      """WITH g AS (SELECT unnest(range(0, 600)) AS i),
        |syms AS (
        |  SELECT chr(CAST(65 + (i // 676) % 26 AS INTEGER))
        |           || chr(CAST(65 + (i // 26) % 26 AS INTEGER))
        |           || chr(CAST(65 + i % 26 AS INTEGER)) AS ticker,
        |         CASE WHEN i % 13 = 0 THEN 'XNAS'
        |              WHEN i % 5 = 1 THEN 'XNYS'
        |              WHEN i % 5 = 2 THEN 'ARCX'
        |              ELSE 'XNAS' END AS mic,
        |         CASE WHEN i % 4 = 3 THEN 'ETF' ELSE 'EQUITY' END AS asset_class
        |  FROM g WHERE i % 11 <> 0)
        |SELECT mic, asset_class, '2024-01-02' AS as_of, count(*) AS n,
        |       min(ticker) AS min_ticker, max(ticker) AS max_ticker
        |FROM syms GROUP BY mic, asset_class ORDER BY mic, asset_class""".stripMargin,
    "s15_polygon_symbols" ->
      """WITH g AS (SELECT unnest(range(0, 700)) AS i),
        |syms AS (
        |  SELECT chr(CAST(65 + (i // 676) % 26 AS INTEGER))
        |           || chr(CAST(65 + (i // 26) % 26 AS INTEGER))
        |           || chr(CAST(65 + i % 26 AS INTEGER)) AS ticker,
        |         CASE i % 6 WHEN 0 THEN 'XNAS' WHEN 1 THEN 'XNYS'
        |              WHEN 2 THEN 'ARCX' WHEN 3 THEN 'BATS'
        |              WHEN 4 THEN 'IEXG' ELSE 'OTCM' END AS mic,
        |         CASE i % 5 WHEN 1 THEN 'ETF' WHEN 2 THEN 'ADR'
        |              WHEN 3 THEN 'REIT' ELSE 'EQUITY' END AS asset_class,
        |         CASE WHEN i % 9 = 0 THEN 'DELISTED' ELSE 'ACTIVE' END AS status,
        |         CASE WHEN i % 3 <> 0 THEN 'BBG' END AS figi
        |  FROM g)
        |SELECT mic, asset_class, status, count(*) AS n,
        |       count(figi) AS n_figi, min(ticker) AS min_ticker
        |FROM syms GROUP BY mic, asset_class, status
        |ORDER BY mic, asset_class, status""".stripMargin
  )
}
