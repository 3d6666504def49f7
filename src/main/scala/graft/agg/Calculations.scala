package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Financial calculation services: VWAP, daily summary, rolling indicators.
  * (ref: src/marketpipe/domain/services.py:38-371,
  *  src/marketpipe/domain/aggregates.py:212-330)
  *
  * All are column-expression / window-function compositions — no UDFs, so
  * everything stays inside whole-stage codegen.
  */
object Calculations {

  /** Price used for VWAP: explicit vwap if present, else typical price
    * (high+low+close)/3 (ref: domain/services.py:44-56).
    */
  def typicalPrice: Column =
    (col("high") + col("low") + col("close")) / 3.0

  /** VWAP per group: sum(price*volume)/sum(volume), skipping zero-volume
    * bars (ref: domain/services.py:38-76). Group keys are caller-chosen.
    */
  def vwap(bars: DataFrame, groupCols: Seq[String]): DataFrame = {
    val price = typicalPrice
    bars
      .where(col("volume") > 0)
      .groupBy(groupCols.map(col): _*)
      // micro-unit quantization + decimal sum: order-insensitive (see
      // dailySummary) so results are stable under any partitioning
      .agg((sum((floor(price * 1000000.0 + 0.5) * col("volume")).cast("decimal(38,0)"))
        .cast("double") / lit(1000000.0) /
        nullif(sum(col("volume")).cast("double"), lit(0.0))).as("vwap"))
  }

  /** Daily summary per (symbol, day): open=first, close=last, high=max,
    * low=min, volume=sum, bar_count, first/last bar time, vwap.
    * (ref: domain/services.py:78-139; aggregates.py:212-330)
    */
  def dailySummary(bars: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val price = typicalPrice
    bars
      .groupBy(col("symbol"), Resampler.bucketNs(col("ts_ns"), dayNs).as("day_ts"))
      .agg(
        min_by(col("open"), col("ts_ns")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("ts_ns")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("bar_count"),
        min(col("ts_ns")).as("first_bar_ts"),
        max(col("ts_ns")).as("last_bar_ts"),
        // order-insensitive accumulation: double sums vary with partial-agg
        // order, so quantize price to integer micro-units (pure IEEE ops,
        // deterministic) and sum exactly in decimal — associative, no
        // overflow at any group size
        (sum(when(col("volume") > 0,
            (floor(price * 1000000.0 + 0.5) * col("volume")).cast("decimal(38,0)"))
            .otherwise(lit(0).cast("decimal(38,0)"))).cast("double") /
          lit(1000000.0) /
          nullif(sum(when(col("volume") > 0, col("volume")).otherwise(lit(0L)))
            .cast("double"), lit(0.0))).as("vwap")
      )
  }

  private def perSymbol = Window.partitionBy("symbol").orderBy("ts_ns")

  /** Rolling simple moving average over the last `n` bars per symbol;
    * null until the window is full (ref: domain/services.py:284-326).
    */
  def sma(bars: DataFrame, n: Int, valueCol: String = "close"): DataFrame = {
    val w = perSymbol.rowsBetween(-(n - 1), 0)
    bars.withColumn(
      s"sma_$n",
      when(count(lit(1)).over(w) === n, avg(col(valueCol)).over(w)))
  }

  /** Rolling volatility: sample stddev of log returns ln(close/prev_close)
    * over the last `n` returns; null until full
    * (ref: domain/services.py:328-371).
    */
  def volatility(bars: DataFrame, n: Int): DataFrame = {
    // guard: log returns are undefined for non-positive prices (and ANSI
    // mode makes x/0 an error, not Inf) -> null return, excluded from the
    // window count like any missing value
    val prev = lag(col("close"), 1).over(perSymbol)
    val ret = when(prev > 0.0 && col("close") > 0.0, log(col("close") / prev))
    val w = perSymbol.rowsBetween(-(n - 1), 0)
    bars
      .withColumn("log_ret", ret)
      .withColumn(
        s"volatility_$n",
        when(count(col("log_ret")).over(w) === n, stddev_samp(col("log_ret")).over(w)))
  }

  /** Percent change per bar: (close-open)/open*100 (ref: entities.py:178-204). */
  def pctChange: Column = (col("close") - col("open")) / col("open") * 100.0

  /** W9 trailing-pattern anomaly flags (ref: domain/services.py:577-607):
    *  - suspicious_zero_volume: >= 5 zero-volume bars among the last 10;
    *  - volume_spike: current volume > 10x the average of the positive
    *    volumes among the last 20 prior bars.
    */
  def withTrailingPatterns(bars: DataFrame): DataFrame = {
    val w10 = perSymbol.rowsBetween(-9, 0)
    val w20prior = perSymbol.rowsBetween(-20, -1)
    bars
      .withColumn("zero_vol_last10",
        sum((col("volume") === 0).cast("int")).over(w10))
      .withColumn("suspicious_zero_volume", col("zero_vol_last10") >= 5)
      .withColumn("avg_pos_vol_last20",
        avg(when(col("volume") > 0, col("volume"))).over(w20prior))
      .withColumn("volume_spike",
        col("avg_pos_vol_last20").isNotNull &&
          col("volume").cast("double") > col("avg_pos_vol_last20") * 10.0)
  }

  /** Exact pair-covariance sufficient statistics per trading day — the
    * pushdown-friendly correlation "sketch": instead of a rolling
    * Pearson (whose FP sqrt/summation order is engine- and
    * partitioning-dependent), emit the six exact sums (n, Σx, Σy, Σxy,
    * Σx², Σy²) from which any consumer derives covariance/correlation at
    * its own precision. Prices are quantized to integer 1e-4 units
    * (the VWAP micro-unit discipline), so every sum is an
    * order-independent exact long — bit-stable under any partitioning
    * and engine-exact vs the oracle. Magnitudes stay well inside both
    * long and double-exact range for day-sized groups (≤288 5-minute
    * buckets × ~1e12 per product term).
    *
    * Alignment: per symbol, last close of each `bucketNs` bucket
    * (row_number, ties broken by close desc — deterministic), inner
    * join on the shared buckets, one global aggregate row. One window +
    * one equi-join + one partial aggregate; per-pair cost is the two
    * symbols' row counts, so a 100 TB store prices pairs independently.
    */
  def pairCovarianceSums(bars: DataFrame, symA: String, symB: String,
                         bucketNs: Long = 3600000000000L): DataFrame = {
    def leg(sym: String, out: String): DataFrame = {
      val w = Window.partitionBy("bucket")
        .orderBy(col("ts_ns").desc, col("close").desc)
      bars.where(col("symbol") === sym)
        .withColumn("bucket", col("ts_ns") - col("ts_ns") % bucketNs)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("bucket"),
          floor(col("close") * 10000.0 + 0.5).cast("long").as(out))
    }
    leg(symA, "x").join(leg(symB, "y"), Seq("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"),
        sum(col("y") * col("y")).as("sum_yy"))
  }
}
