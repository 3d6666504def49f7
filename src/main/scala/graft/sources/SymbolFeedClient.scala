package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._

/** Symbol-list provider client (SURVEY §2.1 S15; ref: the provider symbol
  * feeds consumed by src/marketpipe/ingestion/pipeline/symbol_pipeline.py
  * and the per-provider reference-data adapters): pages of
  * `{"symbols": [{"ticker","name","mic","figi"}], "next_page_token": ...}`
  * drained through the same rate-limited retrying [[PagedApiClient]]
  * machinery, then distributed as a snapshot frame ready for
  * `Normalizer.withIdentifierValidity` -> `ScdMerge`.
  */
final class SymbolFeedClient(
    config: ClientConfig,
    auth: AuthStrategy,
    http: HttpClient,
    rateLimiter: Option[TokenBucket] = None,
    state: ClientState = ClientState.Noop)
  extends PagedApiClient(config, auth, http, rateLimiter, state) {

  def endpointPath(symbol: String): String = "/v1/symbols"

  def buildParams(symbol: String, startNs: Long, endNs: Long,
                  cursor: Option[String]): Map[String, String] = {
    val base = Map("limit" -> config.pageLimit.toString)
    cursor.fold(base)(c => base + ("page_token" -> c))
  }

  def nextCursor(page: JValue): Option[String] =
    page \ "next_page_token" match {
      case JString(s) if s.nonEmpty => Some(s)
      case _ => None
    }

  /** Not bar-shaped; symbol pages are parsed by [[symbolPages]]. */
  def parsePage(page: JValue): Seq[PagedProviderSource.ProviderRecord] = Nil

  def symbolPage(page: JValue): Seq[(String, String, String, String)] =
    page \ "symbols" match {
      case JArray(items) => items.flatMap { s =>
        // figi is optional (null/absent lands a null column — the natural
        // key falls back to ticker|mic downstream); the rest are required
        val figi = s \ "figi" match { case JString(f) => f; case _ => null }
        (s \ "ticker", s \ "name", s \ "mic") match {
          case (JString(t), JString(n), JString(m)) => Some((t, n, m, figi))
          case _ => None
        }
      }
      case _ => None.toSeq
    }

  /** Drain every page into a snapshot DataFrame. */
  def fetchSymbols(spark: SparkSession): DataFrame = {
    val rows = paginate("*", 0L, 0L).flatMap(symbolPage)
      .map { case (t, n, m, f) => Row(t, n, m, f) }.toSeq
    val schema = StructType(Seq(
      StructField("ticker", StringType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("mic", StringType, nullable = false),
      StructField("figi", StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList), schema)
  }
}

/** Deterministic in-process symbol server: symbol i has
  *   ticker = base-26 letters of i (3 chars),
  *   mic    = XNAS/XNYS/ARCX by i mod 3,
  *   figi   = "BBG" + 8-digit zero-padded i + correct FIGI check digit —
  *            except every 7th symbol, whose check digit is corrupted
  *            (+1 mod 10) so downstream validation has true negatives.
  */
final class FakeSymbolServer(nSymbols: Int, pageSize: Int) extends HttpClient {

  private def ticker(i: Int): String =
    Seq(i / 676 % 26, i / 26 % 26, i % 26).map(d => ('A' + d).toChar).mkString

  private def mic(i: Int): String = (i % 3) match {
    case 0 => "XNAS"; case 1 => "XNYS"; case _ => "ARCX"
  }

  /** FIGI check digit (public algorithm): char values (digit=d,
    * letter=10..35), double even 1-based positions, sum all digit-sums,
    * check = (10 - sum mod 10) mod 10.
    */
  private def figi(i: Int): String = {
    val body = "BBG" + f"$i%08d"
    val vals = body.map(c => if (c.isDigit) c - '0' else c - 'A' + 10)
    val sum = vals.zipWithIndex.map { case (v, idx) =>
      val x = if ((idx + 1) % 2 == 0) v * 2 else v
      x / 10 + x % 10
    }.sum
    val check = (10 - sum % 10) % 10
    val digit = if (i % 7 == 0) (check + 1) % 10 else check
    body + digit
  }

  def get(url: String, params: Map[String, String],
          headers: Map[String, String], timeoutMs: Long): HttpResponse = {
    val start = params.get("page_token").flatMap(_.toIntOption).getOrElse(0)
    val end = (start + pageSize).min(nSymbols)
    val items = (start until end).map { i =>
      s"""{"ticker":"${ticker(i)}","name":"Company ${ticker(i)}","mic":"${mic(i)}","figi":"${figi(i)}"}"""
    }.mkString(",")
    val token = if (end < nSymbols) s""""$end"""" else "null"
    HttpResponse(200, Map.empty,
      s"""{"symbols":[$items],"next_page_token":$token}""")
  }
}
