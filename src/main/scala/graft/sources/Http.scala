package graft.sources

/** Minimal HTTP protocol for dependency injection (SURVEY §2.1 S13; ref:
  * ingestion/infrastructure/http_client_protocol.py:31-76). The library
  * never opens sockets itself — callers inject a real client in production
  * and tests inject deterministic fakes, exactly the reference's seam.
  */
final case class HttpResponse(
    status: Int,
    headers: Map[String, String],
    body: String) {
  def header(name: String): Option[String] =
    headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
}

trait HttpClient {
  def get(
      url: String,
      params: Map[String, String],
      headers: Map[String, String],
      timeoutMs: Long): HttpResponse
}

/** Authentication strategies (ref: ingestion/infrastructure/auth.py:8-38):
  * pure functions from (headers, params) to enriched (headers, params).
  */
trait AuthStrategy {
  def apply(headers: Map[String, String], params: Map[String, String])
      : (Map[String, String], Map[String, String])

  /** Secret material this strategy injects — used to mask error/log text
    * (a provider error body can echo the request URL/params).
    */
  def secrets: Seq[String] = Seq.empty
}

object AuthStrategy {
  /** Bearer token header. */
  final case class TokenAuth(token: String) extends AuthStrategy {
    def apply(h: Map[String, String], p: Map[String, String]) =
      (h + ("Authorization" -> s"Bearer $token"), p)
    override def secrets: Seq[String] = Seq(token)
  }

  /** Key-id + secret header pair (vendor-style two-header auth). */
  final case class HeaderKeyAuth(
      keyHeader: String, keyId: String,
      secretHeader: String, secret: String) extends AuthStrategy {
    def apply(h: Map[String, String], p: Map[String, String]) =
      (h + (keyHeader -> keyId) + (secretHeader -> secret), p)
    override def secrets: Seq[String] = Seq(keyId, secret)
  }

  /** Token passed as a query parameter. */
  final case class QueryTokenAuth(param: String, token: String) extends AuthStrategy {
    def apply(h: Map[String, String], p: Map[String, String]) =
      (h, p + (param -> token))
    override def secrets: Seq[String] = Seq(token)
  }

  case object NoAuth extends AuthStrategy {
    def apply(h: Map[String, String], p: Map[String, String]) = (h, p)
  }
}

/** Production [[HttpClient]] over `java.net.http` (JDK 11+) — the one
  * place a real socket can be opened. Tests and the driver-verified
  * queries never construct it; they inject deterministic fakes.
  */
final class JdkHttpClient extends HttpClient {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = {
    val qs = params.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val full = if (qs.isEmpty) url
               else url + (if (url.contains("?")) "&" else "?") + qs
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(full))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val r = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    val hdrs = r.headers().map().entrySet().iterator()
    val m = scala.collection.mutable.Map.empty[String, String]
    while (hdrs.hasNext) {
      val e = hdrs.next()
      if (!e.getValue.isEmpty) m.put(e.getKey, e.getValue.get(0))
    }
    HttpResponse(r.statusCode(), m.toMap, r.body())
  }
}
