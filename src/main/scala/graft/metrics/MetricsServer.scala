package graft.metrics

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Live Prometheus scrape endpoint over the metrics store — the serving
  * half of the reference's metrics server (ref: metrics_server.py:37-200):
  * GET /metrics returns the text exposition; any other path 404s with a
  * "try /metrics" hint (ref: metrics_server.py:140-142); non-GET methods
  * are rejected 405. Built on the JDK's bundled HTTP server, so wiring the
  * engine into an existing Prometheus scrape config needs no extra
  * dependency. Each scrape re-derives the exposition from the store's
  * latest-per-(name,provider,feed) rollup — metadata-scale work.
  *
  * `port = 0` binds an ephemeral port (tests); [[start]] returns the bound
  * port either way.
  */
final class MetricsServer(store: MetricsStore, port: Int = 8000,
                          host: String = "localhost") {

  @volatile private var server: Option[HttpServer] = None

  def start(): Int = synchronized {
    require(server.isEmpty, "metrics server already running")
    val s = HttpServer.create(new InetSocketAddress(host, port), 0)
    s.createContext("/", (ex: HttpExchange) => handle(ex))
    s.setExecutor(null) // serve on the dispatch thread; scrapes are serial
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
  }

  private def handle(ex: HttpExchange): Unit = {
    val (status, body, contentType) =
      if (ex.getRequestURI.getPath != "/metrics")
        (404, "Not found - try /metrics", "text/plain; charset=utf-8")
      else if (ex.getRequestMethod != "GET")
        (405, "Method not allowed", "text/plain; charset=utf-8")
      else
        try (200, store.prometheusText(),
          "text/plain; version=0.0.4; charset=utf-8")
        catch { case e: Exception =>
          (500, s"scrape failed: ${e.getMessage}", "text/plain; charset=utf-8")
        }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
