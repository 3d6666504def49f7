package graft.metrics

import graft.SparkSpec

/** Live Prometheus scrape endpoint over the metrics store: /metrics serves
  * the text exposition, other paths 404 with a hint, label values are
  * escaped per the format, and colliding sanitized names share one TYPE
  * block.
  */
class MetricsServerSpec extends SparkSpec {

  private def httpGet(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    (code, body)
  }

  test("GET /metrics serves the exposition; other paths 404 with a hint") {
    val dir = java.nio.file.Files.createTempDirectory("metrics_srv").toString
    val store = new MetricsStore(spark, dir)
    store.record(Seq(
      (1000L, "bars_ingested", 42.0, "fake", "iex"),
      (2000L, "bars_ingested", 99.0, "fake", "iex")))
    val srv = new MetricsServer(store, port = 0) // ephemeral port
    val port = srv.start()
    try {
      val (code, body) = httpGet(s"http://localhost:$port/metrics")
      assert(code == 200)
      assert(body.contains("# TYPE graft_bars_ingested gauge"))
      // latest-wins value with a millisecond timestamp
      assert(body.contains(
        """graft_bars_ingested{provider="fake",feed="iex"} 99.0 2000000"""))
      val (nf, hint) = httpGet(s"http://localhost:$port/nope")
      assert(nf == 404 && hint.contains("/metrics"))
    } finally srv.stop()
  }

  test("exposition escapes label values and merges colliding sanitized names") {
    val dir = java.nio.file.Files.createTempDirectory("metrics_esc").toString
    val store = new MetricsStore(spark, dir)
    store.record(Seq(
      (1000L, "weird.metric", 1.0, "a\"b", "c\\d\ne"),
      (1000L, "weird-metric", 2.0, "p", "f"))) // sanitizes to the same name
    val text = store.prometheusText()
    assert(text.contains("""provider="a\"b""""))
    assert(text.contains("""feed="c\\d\ne""""))
    // one TYPE block for the merged name, not two
    assert("# TYPE graft_weird_metric gauge".r
      .findAllIn(text).length == 1)
    assert(text.linesIterator.count(_.startsWith("graft_weird_metric{")) == 2)
  }

  test("merged names colliding on identical labels emit ONE sample (freshest)") {
    val dir = java.nio.file.Files.createTempDirectory("metrics_dup").toString
    val store = new MetricsStore(spark, dir)
    // two RAW names, same sanitized metric, SAME (provider, feed): two
    // samples with identical name+labels would fail the whole scrape
    store.record(Seq(
      (1000L, "bars.ingested", 1.0, "p", "f"),
      (2000L, "bars-ingested", 2.0, "p", "f")))
    val text = store.prometheusText()
    val lines = text.linesIterator.filter(_.startsWith("graft_bars_ingested{")).toSeq
    assert(lines.size == 1, s"expected one deduped sample, got:\n$text")
    assert(lines.head.contains(" 2.0 2000000")) // the freshest wins
  }
}
