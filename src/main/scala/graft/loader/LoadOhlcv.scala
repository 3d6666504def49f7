package graft.loader

import graft.core.FrameSpec
import graft.storage.ParquetStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public programmatic loader — the `load_ohlcv` API
  * (ref: src/marketpipe/loader.py:29-232).
  *
  * One scan with `symbol.isin` partition filter + `ts_ns BETWEEN` pushdown +
  * orderBy — the reference's serial per-symbol DuckDB loop disappears into
  * Spark task parallelism (SURVEY §3.2).
  */
object LoadOhlcv {
  private val validFrames = Set("1m", "5m", "15m", "1h", "4h", "1d")

  def apply(
      spark: SparkSession,
      root: String,
      symbols: Seq[String],
      timeframe: String = "1m",
      startNs: Long = 0L,
      endNs: Long = Long.MaxValue
  ): DataFrame = {
    require(validFrames.contains(timeframe), s"invalid timeframe: $timeframe")
    val upper = symbols.map(_.toUpperCase)
    new ParquetStore(spark, root)
      .load(FrameSpec.byName(timeframe), upper, Some(startNs), Some(endNs))
      .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
      // integer `div`: double division of ns epochs can land 1 µs low
      .withColumn("timestamp", timestamp_micros(expr("ts_ns div 1000")))
      .orderBy("symbol", "ts_ns")
  }
}
