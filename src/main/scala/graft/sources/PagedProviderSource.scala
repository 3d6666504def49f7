package graft.sources

import graft.core.{OhlcvBar, Schemas}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Anti-corruption edge for provider-style paged bar feeds (SURVEY §2.1
  * S13; ref: src/marketpipe/ingestion/infrastructure/adapters.py:193-255).
  *
  * Providers hand back pages of loosely-typed records; this boundary
  * translates them into the canonical 7-column bar frame, dropping rows
  * that cannot form a valid bar (the reference's translate step). The
  * fetch itself is driver-side (a paged HTTP loop in the reference; any
  * `Iterator[Seq[ProviderRecord]]` here) — the data volume per job is one
  * provider page stream, so the driver is not a bottleneck; everything
  * after `toBars` is distributed.
  */
object PagedProviderSource {

  /** One loosely-typed provider record (what a JSON page parses into). */
  final case class ProviderRecord(
      symbol: String,
      timestampNs: Option[Long],
      open: Option[Double], high: Option[Double],
      low: Option[Double], close: Option[Double],
      volume: Option[Long])

  /** Translate provider records to domain bars; invalid records (missing
    * required fields) are dropped, mirroring the reference's
    * anti-corruption translate.
    */
  def translate(r: ProviderRecord): Option[OhlcvBar] =
    for {
      ts <- r.timestampNs
      o <- r.open; h <- r.high; l <- r.low; c <- r.close
      v <- r.volume
    } yield OhlcvBar(r.symbol.toUpperCase, ts, o, h, l, c, v)

  /** Drain a paged fetch into one canonical bars DataFrame. */
  def toBars(spark: SparkSession, pages: Iterator[Seq[ProviderRecord]]): DataFrame = {
    val rows = pages.flatten.flatMap(translate).map(b =>
      Row(b.symbol, b.ts_ns, b.open, b.high, b.low, b.close, b.volume)).toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), Schemas.bars)
  }

  /** Full paged-client ingest: fetch every page for (symbol, range) through
    * the rate-limited retrying client, then distribute as canonical bars.
    */
  def ingest(spark: SparkSession, client: PagedApiClient,
             symbol: String, startNs: Long, endNs: Long): DataFrame =
    toBars(spark, client.pages(symbol, startNs, endNs))
}
