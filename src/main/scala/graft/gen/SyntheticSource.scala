package graft.gen

import graft.core.FrameSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic OHLCV source — the engine's "fake provider".
  *
  * Reproduces the semantics of the reference's fake adapter
  * (ref: src/marketpipe/ingestion/infrastructure/fake_adapter.py:72-179):
  * per-symbol base price offset, gaussian intrabar moves, OHLC-consistency
  * clamp (high = max of open/close + noise, low = min − noise), log-normal
  * volume, minute-stepped timestamps over [start, end).
  *
  * Spark-first: generation is `spark.range(nBars)` + column expressions
  * (`randn(seed)`, `greatest`/`least` clamps, `exp` volume) so it scales to
  * any number of bars without driver-side loops.
  */
object SyntheticSource {

  /** Deterministic base price per symbol: 100.0 + (stable hash % 1000)/10
    * (ref: fake_adapter.py:96-99 uses Python hash; we use crc32 — a public,
    * engine-stable hash — so reruns are identical across JVMs).
    */
  def basePriceExpr = {
    (lit(100.0) + (crc32(col("symbol")) % 1000).cast("double") / 10.0)
  }

  /** Generate `nBars` consecutive 1-minute bars for each symbol starting at
    * `startTsNs`. Deterministic for a given seed.
    */
  def bars(
      spark: SparkSession,
      symbols: Seq[String],
      startTsNs: Long,
      nBars: Int,
      seed: Long = 42L,
      volatility: Double = 0.02
  ): DataFrame = {
    import spark.implicits._
    val syms = symbols.toDF("symbol")
    val idx = spark.range(nBars.toLong).toDF("i")
    // cross join is tiny on the symbol side; the range side scales out
    val base = idx.crossJoin(broadcast(syms))
      .withColumn("ts_ns", lit(startTsNs) + $"i" * lit(60L * 1000000000L))
      .withColumn("base", basePriceExpr)
    // seeded gaussian walk: open = base * (1 + cumulative drift), intrabar
    // gaussian noise, clamp for OHLC consistency, log-normal volume
    val noisy = base
      .withColumn("drift", randn(seed) * volatility)
      .withColumn("noise1", abs(randn(seed + 1)) * volatility)
      .withColumn("noise2", abs(randn(seed + 2)) * volatility)
      .withColumn("open", round($"base" * (lit(1.0) + $"drift"), 2))
      .withColumn("close", round($"base" * (lit(1.0) + $"drift" + randn(seed + 3) * volatility), 2))
      .withColumn("high", round(greatest($"open", $"close") * (lit(1.0) + $"noise1"), 2))
      .withColumn("low", round(least($"open", $"close") * (lit(1.0) - $"noise2"), 2))
      .withColumn("volume", exp(randn(seed + 4) * 1.5 + 8.0).cast("long"))
    noisy.select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
  }

  /** Bars for a [start, end) time range at a given frame (default 1m). */
  def barsForRange(
      spark: SparkSession,
      symbols: Seq[String],
      startTsNs: Long,
      endTsNs: Long,
      frame: FrameSpec = FrameSpec.F1m,
      seed: Long = 42L
  ): DataFrame = {
    val n = ((endTsNs - startTsNs) / frame.nanos).toInt
    bars(spark, symbols, startTsNs, n, seed)
  }
}
