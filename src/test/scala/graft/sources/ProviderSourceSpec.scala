package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSourceV2 distributed provider fetch: one input partition per
  * symbol, vendor dialect resolved by registry name executor-side.
  */
class ProviderSourceSpec extends SparkSpec {

  private def read(symbols: String) =
    spark.read.format("graft-provider")
      .option("provider", "fake") // registry entry wraps the in-process wire server
      .option("symbols", symbols)
      .option("startNs", "0")
      .option("endNs", (390L * 60000000000L).toString)
      .load()

  test("short name resolves; one partition per symbol; bars are the fake formula") {
    val df = read("AAA,BBB,CCC")
    assert(df.schema == graft.core.Schemas.bars)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 3 * 390L)
    val perSym = df.groupBy("symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSym == Map("AAA" -> 390L, "BBB" -> 390L, "CCC" -> 390L))
    // spot-check the deterministic wire formula (bar i of any symbol)
    val b7 = df.where(col("symbol") === "BBB" && col("ts_ns") === 7L * 60000000000L)
      .head()
    assert(b7.getAs[Double]("close") == (10000 + (7 * 37) % 5000) / 100.0)
    assert(b7.getAs[Long]("volume") == (7L * 7919L) % 997L + 1L)
  }

  test("column pruning and filters compose over the source") {
    val df = read("AAA,BBB")
      .where(col("symbol") === "AAA" && col("volume") > 500L)
      .select("symbol", "volume")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getString(0) == "AAA" && r.getLong(1) > 500L))
  }

  test("reader options reach the executor-side client config") {
    // a factory whose bar count IS the configured pageLimit: the only way
    // this read returns 123 rows is if the option survived the
    // case-insensitive plumbing into ClientConfig on the reader
    ProviderRegistry.register("spec-pages", (cfg, auth, _) =>
      new BarFeedClient(cfg, auth,
        new FakeBarServer(nBars = cfg.pageLimit, pageSize = 50)),
      needsEndpoint = false)
    val df = spark.read.format("graft-provider")
      .option("provider", "spec-pages")
      .option("symbols", "AAA")
      .option("pageLimit", "123")
      .load()
    assert(df.count() == 123L)
  }

  test("misconfigured reads fail at planning time on the driver") {
    // no provider option at all — must not silently default to 'barfeed'
    val noProv = intercept[Exception] {
      spark.read.format("graft-provider").option("symbols", "A").load().count()
    }
    assert(noProv.getMessage.contains("provider") ||
      Option(noProv.getCause).exists(_.getMessage.contains("provider")))
    // real HTTP dialect without an endpoint — must fail before any task runs
    val noUrl = intercept[Exception] {
      spark.read.format("graft-provider")
        .option("provider", "polygon").option("symbols", "A").load().count()
    }
    assert(noUrl.getMessage.contains("baseurl") ||
      Option(noUrl.getCause).exists(_.getMessage.contains("baseurl")))
  }

  test("unknown provider name fails with the registry inventory") {
    val e = intercept[Exception] {
      spark.read.format("graft-provider")
        .option("provider", "nope").option("symbols", "A")
        .load().count()
    }
    assert(e.getMessage.contains("nope") ||
      Option(e.getCause).exists(_.getMessage.contains("nope")))
  }
}
