package graft.core

import org.apache.spark.sql.types._

/** A resampling time frame: name + bucket length in seconds.
  *
  * Mirrors the reference's FrameSpec value object
  * (ref: src/marketpipe/aggregation/domain/value_objects.py:7-24).
  */
final case class FrameSpec(name: String, seconds: Long) {
  def nanos: Long = seconds * 1000000000L
}

object FrameSpec {
  val F1m  = FrameSpec("1m", 60L)
  val F5m  = FrameSpec("5m", 300L)
  val F15m = FrameSpec("15m", 900L)
  val F1h  = FrameSpec("1h", 3600L)
  val F4h  = FrameSpec("4h", 14400L)
  val F1d  = FrameSpec("1d", 86400L)

  /** Default aggregation targets (ref: value_objects.py defaults 5m/15m/1h/4h/1d). */
  val defaults: Seq[FrameSpec] = Seq(F5m, F15m, F1h, F4h, F1d)

  def byName(n: String): FrameSpec = n match {
    case "1m" => F1m; case "5m" => F5m; case "15m" => F15m
    case "1h" => F1h; case "4h" => F4h; case "1d" => F1d
    case other => throw new IllegalArgumentException(s"unknown frame: $other")
  }
}

/** One OHLCV bar: the core fact of the engine.
  *
  * Invariants (enforced by the validation layer, not the constructor —
  * Spark-side validation is columnar): high >= max(open, close, low),
  * low <= min(open, close), volume >= 0, ts_ns minute-aligned for 1m bars.
  * (ref: src/marketpipe/domain/entities.py:72-126)
  */
final case class OhlcvBar(
    symbol: String,
    ts_ns: Long,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Long
)

/** Canonical StructTypes. Never infer schemas — the reference versions its
  * schema explicitly (ref: schema/schema_v1.json).
  */
object Schemas {

  /** The 7-column core every storage/aggregation path uses
    * (ref: parquet_engine.py:83-86, 220-231).
    */
  val bars: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("ts_ns", LongType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)
  ))

  /** Full v1 bar schema (ref: schema/schema_v1.json, name ohlcv_1m_bars_v1). */
  val barsV1: StructType = StructType(bars.fields.toSeq ++ Seq(
    StructField("date", DateType, nullable = true),
    StructField("vwap", DoubleType, nullable = true),
    StructField("trade_count", IntegerType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("frame", StringType, nullable = true),
    StructField("ingest_id", StringType, nullable = true),
    StructField("schema_version", IntegerType, nullable = true)
  ))

  /** Validation error row (ref: validation/domain/value_objects.py:9-29). */
  val validationError: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("ts_ns", LongType, nullable = false),
    StructField("reason", StringType, nullable = false)
  ))

  /** SCD-2 symbols_master, 16 columns (ref: scd_writer.py:444-465). */
  val symbolsMaster: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("natural_key", StringType, nullable = false),
    StructField("symbol", StringType, nullable = true),
    StructField("company_name", StringType, nullable = true),
    StructField("exchange", StringType, nullable = true),
    StructField("asset_type", StringType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("market_cap", LongType, nullable = true),
    StructField("sector", StringType, nullable = true),
    StructField("industry", StringType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("currency", StringType, nullable = true),
    StructField("valid_from", DateType, nullable = false),
    StructField("valid_to", DateType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("as_of", DateType, nullable = true)
  ))

  /** Staged SymbolRecord: the full 22-field provider-snapshot row,
    * including the provider-specific `meta` map — the reference's one
    * nested column (ref: domain/symbol.py:58-106).
    */
  val symbolRecord: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("ticker", StringType, nullable = false),
    StructField("figi", StringType, nullable = true),
    StructField("cusip", StringType, nullable = true),
    StructField("isin", StringType, nullable = true),
    StructField("cik", StringType, nullable = true),
    StructField("exchange_mic", StringType, nullable = false),
    StructField("asset_class", StringType, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("country", StringType, nullable = true),
    StructField("sector", StringType, nullable = true),
    StructField("industry", StringType, nullable = true),
    StructField("first_trade_date", DateType, nullable = true),
    StructField("delist_date", DateType, nullable = true),
    StructField("status", StringType, nullable = false),
    StructField("shares_outstanding", LongType, nullable = true),
    StructField("free_float", LongType, nullable = true),
    StructField("company_name", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true),
    StructField("as_of", DateType, nullable = false),
    StructField("provider", StringType, nullable = true),
    StructField("natural_key", StringType, nullable = true)
  ))

  /** Metrics store row (ref: src/marketpipe/metrics.py:145-156). */
  val metrics: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false), // epoch seconds
    StructField("name", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("provider", StringType, nullable = true),
    StructField("feed", StringType, nullable = true)
  ))
}
