package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Provider client layer: pagination, auth, retry/backoff, Retry-After,
  * rate limiting, registry, and the paged-ingest e2e into a DataFrame —
  * all against the in-process fake server (the reference tests its clients
  * against fake HTTP protocols the same way).
  */
class ProviderClientSpec extends SparkSpec {

  private val cfg = ClientConfig("http://fake", backoffBaseMs = 200L)

  private def noSleep: Long => Unit = _ => ()

  test("paginates with cursors and applies auth headers") {
    val server = new FakeBarServer(nBars = 250, pageSize = 100)
    val auth = AuthStrategy.HeaderKeyAuth("X-KEY-ID", "k1", "X-SECRET", "s1")
    val client = new BarFeedClient(cfg, auth, server, sleepMs = noSleep)
    val recs = client.fetchBatch("ACME", 0L, 250L * 60000000000L)
    assert(recs.length == 250)
    assert(server.requests.length == 3)
    assert(server.requests(0)._2.get("page_token").isEmpty)
    assert(server.requests(1)._2.get("page_token").contains("100"))
    assert(server.requests(2)._2.get("page_token").contains("200"))
    assert(server.requests.forall(r =>
      r._3.get("X-KEY-ID").contains("k1") && r._3.get("X-SECRET").contains("s1")))
    assert(server.requests.forall(_._2.get("symbols").contains("ACME")))
  }

  test("retries transient 500s with capped exponential backoff") {
    val server = new FakeBarServer(nBars = 10, pageSize = 10, failFirstN = 2)
    val sleeps = ArrayBuffer.empty[Long]
    val client = new BarFeedClient(cfg, AuthStrategy.NoAuth, server,
      sleepMs = sleeps += _)
    val recs = client.fetchBatch("T", 0L, 1L)
    assert(recs.length == 10)
    assert(sleeps.toSeq == Seq(200L, 400L)) // base * 2^(attempt-1)
  }

  test("throws after maxRetries exhausted, masking the api key") {
    val server = new FakeBarServer(nBars = 10, pageSize = 10, failFirstN = 99)
    val secretCfg = cfg.copy(apiKey = "SUPERSECRET99")
    val client = new BarFeedClient(secretCfg, AuthStrategy.NoAuth, server, sleepMs = noSleep)
    val e = intercept[RuntimeException](client.fetchBatch("T", 0L, 1L))
    assert(e.getMessage.contains("exceeded 3 retries"))
    assert(!e.getMessage.contains("SUPERSECRET99"))
  }

  test("429 Retry-After freezes the rate limiter until the resume time") {
    var nowNs = 0L
    val sleeps = ArrayBuffer.empty[Long]
    val sleep: Long => Unit = ms => { sleeps += ms; nowNs += ms * 1000000L }
    val bucket = new TokenBucket(10, 1000.0, () => nowNs, sleep)
    // two pages: page 1 hits a 429 (freezing the bucket for 7 s), so
    // page 2's acquire() must wait out the remaining Retry-After window
    val server = new FakeBarServer(nBars = 20, pageSize = 10,
      failFirstN = 1, failStatus = 429, retryAfterSec = 7L)
    val client = new BarFeedClient(cfg, AuthStrategy.NoAuth, server,
      rateLimiter = Some(bucket), sleepMs = sleep)
    val recs = client.fetchBatch("T", 0L, 1L)
    assert(recs.length == 20)
    assert(bucket.waits >= 1)
    assert(sleeps.exists(_ >= 6000L))
  }

  test("token bucket: burst to capacity, then refill-rate waits") {
    var nowNs = 0L
    val sleep: Long => Unit = ms => nowNs += ms * 1000000L
    val bucket = new TokenBucket(3, 2.0, () => nowNs, sleep) // 2 tokens/sec
    assert(bucket.acquire() == 0L)
    assert(bucket.acquire() == 0L)
    assert(bucket.acquire() == 0L) // burst of `capacity` is free
    val waited = bucket.acquire()  // empty: next token in ~0.5 s
    assert(waited >= 450L && waited <= 600L, s"waited $waited ms")
  }

  test("registry resolves built-ins and registers new providers") {
    assert(ProviderRegistry.list().contains("barfeed"))
    assert(ProviderRegistry.list().contains("fake"))
    assert(ProviderRegistry.get("nope").isEmpty)
    ProviderRegistry.register("custom",
      (c, a, h) => new BarFeedClient(c, a, h))
    assert(ProviderRegistry.get("custom").isDefined)
    val client = ProviderRegistry.get("fake").get(
      cfg, AuthStrategy.NoAuth, new FakeBarServer(1, 1))
    assert(client.isInstanceOf[BarFeedClient])
  }

  test("checkpoint resume: a crashed fetch continues from the saved cursor") {
    val state = new ClientState.InMemory
    // 400 bars / 100-page: request 3 (serving bars 200-300) fails hard
    val crashServer = new FakeBarServer(nBars = 400, pageSize = 100, failAtRequest = 3)
    val c1 = new BarFeedClient(cfg, AuthStrategy.NoAuth, crashServer,
      state = state, sleepMs = noSleep)
    intercept[RuntimeException](c1.fetchBatch("T", 0L, 1L))
    assert(c1.loadCheckpoint("T").contains("200"))
    val freshServer = new FakeBarServer(nBars = 400, pageSize = 100)
    val c2 = new BarFeedClient(cfg, AuthStrategy.NoAuth, freshServer,
      state = state, sleepMs = noSleep)
    val recs = c2.fetchBatch("T", 0L, 1L, resume = true)
    assert(recs.length == 200) // bars 200..399 only
    assert(freshServer.requests.head._2.get("page_token").contains("200"))
    // successful exhaustion clears the checkpoint for the next fresh fetch
    assert(c2.loadCheckpoint("T").forall(_.isEmpty))
  }

  test("symbol feed: paged fetch, real FIGI check digits, 1-in-7 corrupted") {
    val client = new SymbolFeedClient(cfg, AuthStrategy.NoAuth,
      new FakeSymbolServer(nSymbols = 50, pageSize = 13))
    val snap = client.fetchSymbols(spark)
    assert(snap.count() == 50L)
    val validated = graft.symbols.Normalizer.withIdentifierValidity(
      snap.withColumnRenamed("mic", "exchange_mic")
        .withColumn("cusip", lit(null).cast("string"))
        .withColumn("isin", lit(null).cast("string"))
        .withColumn("cik", lit(null).cast("string")))
    val nValid = validated.where(col("figi_valid")).count()
    assert(nValid == 50L - 8L) // i % 7 == 0 for 8 of 0..49
  }

  test("e2e: paged ingest lands a canonical distributed bars frame") {
    val server = new FakeBarServer(nBars = 1000, pageSize = 137)
    val state = new ClientState.InMemory
    val client = new BarFeedClient(cfg, AuthStrategy.NoAuth, server,
      state = state, sleepMs = noSleep)
    val df = PagedProviderSource.ingest(spark, client, "TEST", 0L, 1000L * 60000000000L)
    assert(df.count() == 1000L)
    assert(df.select(countDistinct(col("ts_ns"))).first().getLong(0) == 1000L)
    assert(df.schema.fieldNames.toSeq ==
      Seq("symbol", "ts_ns", "open", "high", "low", "close", "volume"))
    // successful exhaustion clears the resume checkpoint
    assert(client.loadCheckpoint("TEST").forall(_.isEmpty))
  }
}
