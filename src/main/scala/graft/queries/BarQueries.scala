package graft.queries

import graft.agg.{Calculations, Resampler}
import graft.core.{FrameSpec, Tables}
import graft.validate.RuleSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / OHLCV operator queries over the driver's `events` table.
  *
  * `events(event_id, ts, user_id, event_type, value, props)` is mapped to
  * the engine's bar model: symbol := user_id (string), price := value,
  * volume := event_id % 97 + 1 (deterministic, positive). The same mapping
  * is expressed as a CTE in every oracle SQL so both engines aggregate the
  * exact same input.
  *
  * Determinism rules for oracle hash-parity:
  *  - order keys are unique and non-null (symbol, ts_ns);
  *  - double sums go through DECIMAL casts (exact, associative) and are
  *    cast back to DOUBLE at the end;
  *  - bucket math is integer (ts - ts % w), never through doubles.
  */
object BarQueries {

  /** events -> 7-col bars frame used by every query here. */
  def eventBars(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id").cast("string").as("symbol"),
      col("ts_ns"),
      col("value").as("open"),
      col("value").as("high"),
      col("value").as("low"),
      col("value").as("close"),
      ((col("event_id") % 97L) + 1L).cast("long").as("volume")
    )

  /** The same mapping as a DuckDB CTE. */
  val barsCte: String =
    """WITH bars AS (
      |  SELECT CAST(user_id AS VARCHAR) AS symbol,
      |         epoch_ns(ts) AS ts_ns,
      |         value AS open, value AS high, value AS low, value AS close,
      |         CAST(event_id % 97 + 1 AS BIGINT) AS volume
      |  FROM events)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_resample_5m" -> ((s, dir) =>
      Resampler.resample(eventBars(s, dir), FrameSpec.F5m)
        .orderBy("symbol", "ts_ns")),

    "a1_resample_15m" -> ((s, dir) =>
      Resampler.resample(eventBars(s, dir), FrameSpec.F15m)
        .orderBy("symbol", "ts_ns")),

    "a1_resample_1h" -> ((s, dir) =>
      Resampler.resample(eventBars(s, dir), FrameSpec.F1h)
        .orderBy("symbol", "ts_ns")),

    "a1_resample_4h" -> ((s, dir) =>
      Resampler.resample(eventBars(s, dir), FrameSpec.F4h)
        .orderBy("symbol", "ts_ns")),

    "a2_resample_1d_market_open" -> ((s, dir) =>
      Resampler.resampleDaily(eventBars(s, dir))
        .orderBy("symbol", "ts_ns")),

    "a4_daily_summary" -> ((s, dir) =>
      Calculations.dailySummary(eventBars(s, dir))
        .orderBy("symbol", "day_ts")),

    "a5_vwap" -> ((s, dir) => {
      // decimal-exact sum(price*volume)/sum(volume) per symbol
      val b = eventBars(s, dir).where(col("volume") > 0)
      b.groupBy("symbol")
        .agg(
          (sum(col("close").cast("decimal(18,6)") * col("volume"))
            .cast("double") /
            sum(col("volume")).cast("double")).as("raw"))
        .select(col("symbol"), col("raw").as("vwap"))
        .orderBy("symbol")
    }),

    "w5_sma" -> ((s, dir) =>
      Calculations.sma(eventBars(s, dir), 20)
        .select(col("symbol"), col("ts_ns"), round(col("sma_20"), 6).as("sma_20"))
        .orderBy("symbol", "ts_ns")),

    "w6_volatility" -> ((s, dir) =>
      Calculations.volatility(eventBars(s, dir), 20)
        .select(col("symbol"), col("ts_ns"),
          round(col("volatility_20"), 6).as("volatility_20"))
        .orderBy("symbol", "ts_ns")),

    "w7_prev_delta" -> ((s, dir) => {
      val w = Window.partitionBy("symbol").orderBy("ts_ns")
      eventBars(s, dir)
        .withColumn("prev_close", lag(col("close"), 1).over(w))
        .where(col("prev_close").isNotNull && col("prev_close") =!= 0.0)
        .select(col("symbol"), col("ts_ns"),
          (abs(col("open") - col("prev_close")) / col("prev_close")).as("rel_move"))
        .where(col("rel_move") > 0.5)
        .orderBy("symbol", "ts_ns")
    }),

    "v_validation_rules" -> ((s, dir) =>
      RuleSet.validate(eventBars(s, dir))
        .groupBy("reason").agg(count(lit(1)).as("n"))
        .orderBy("reason")),

    // W12: exact pair-covariance sufficient statistics between two
    // symbols' hourly-bucket closes — the FP-free correlation sketch
    // (consumers derive cov/corr at their own precision)
    "w12_pair_covariance" -> ((s, dir) =>
      Calculations.pairCovarianceSums(eventBars(s, dir), "7", "11")),

    "w9_trailing_patterns" -> ((s, dir) => {
      // volume reshaped to exercise both flags: every 7th event zero-vol,
      // every 101st a 50x spike (same derivation in the oracle CTE)
      val b = eventBars(s, dir).withColumn("volume",
        when(col("ts_ns") % 7 === 0, 0L)
          .otherwise(((col("ts_ns") % 97L) + 1L) *
            when(col("ts_ns") % 101 === 0, 50L).otherwise(1L)))
      Calculations.withTrailingPatterns(b)
        .where(col("suspicious_zero_volume") || col("volume_spike"))
        .select("symbol", "ts_ns", "suspicious_zero_volume", "volume_spike")
        .orderBy("symbol", "ts_ns")
    }),

    "a8_bucketed_trend" -> ((s, dir) => {
      // 30-minute buckets: AVG(value), COUNT(*) (ref metrics.py:218-248)
      val b = eventBars(s, dir)
      b.groupBy(Resampler.bucketNs(col("ts_ns"), 1800L * 1000000000L).as("bucket_ts"))
        .agg(
          (sum(col("close").cast("decimal(18,6)")).cast("double") /
            count(lit(1)).cast("double")).as("raw"),
          count(lit(1)).as("n"))
        .select(col("bucket_ts"), col("raw").as("avg_value"), col("n"))
        .orderBy("bucket_ts")
    })
  )

  def oracles: Map[String, String] = {
    val resample5m = resampleSql(300000000000L)
    val resample1h = resampleSql(3600000000000L)
    Map(
      "a1_resample_5m" -> resample5m,
      // all five frames share one parameterized code path + oracle
      "a1_resample_15m" -> resampleSql(900000000000L),
      "a1_resample_1h" -> resample1h,
      "a1_resample_4h" -> resampleSql(14400000000000L),
      "a2_resample_1d_market_open" ->
        s"""$barsCte
           |SELECT symbol,
           |       ts_ns - ts_ns % 86400000000000 + 48600000000000 AS ts_ns,
           |       arg_min(open, ts_ns) AS open, max(high) AS high,
           |       min(low) AS low, arg_max(close, ts_ns) AS close,
           |       CAST(sum(volume) AS BIGINT) AS volume
           |FROM bars GROUP BY 1, 2 ORDER BY symbol, 2""".stripMargin,
      "a4_daily_summary" ->
        s"""$barsCte
           |SELECT symbol, ts_ns - ts_ns % 86400000000000 AS day_ts,
           |       arg_min(open, ts_ns) AS open, max(high) AS high,
           |       min(low) AS low, arg_max(close, ts_ns) AS close,
           |       CAST(sum(volume) AS BIGINT) AS volume, count(*) AS bar_count,
           |       min(ts_ns) AS first_bar_ts, max(ts_ns) AS last_bar_ts,
           |       CAST(sum(CASE WHEN volume > 0 THEN CAST(floor((high+low+close)/3.0 * 1000000.0 + 0.5) AS BIGINT) * volume ELSE 0 END) AS DOUBLE)
           |             / 1000000.0
           |             / nullif(CAST(sum(CASE WHEN volume > 0 THEN volume ELSE 0 END) AS DOUBLE), 0.0) AS vwap
           |FROM bars GROUP BY 1, 2 ORDER BY symbol, day_ts""".stripMargin,
      "a5_vwap" ->
        s"""$barsCte
           |SELECT symbol,
           |       CAST(sum(CAST(close AS DECIMAL(18,6)) * volume) AS DOUBLE)
           |             / CAST(sum(volume) AS DOUBLE) AS vwap
           |FROM bars WHERE volume > 0 GROUP BY symbol ORDER BY symbol""".stripMargin,
      "w5_sma" ->
        s"""$barsCte
           |SELECT symbol, ts_ns,
           |       round(CASE WHEN count(*) OVER w = 20 THEN avg(close) OVER w END, 6) AS sma_20
           |FROM bars
           |WINDOW w AS (PARTITION BY symbol ORDER BY ts_ns ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           |ORDER BY symbol, ts_ns""".stripMargin,
      "w6_volatility" ->
        s"""$barsCte, rets AS (
           |  SELECT symbol, ts_ns,
           |         CASE WHEN lag(close) OVER (PARTITION BY symbol ORDER BY ts_ns) > 0.0 AND close > 0.0
           |              THEN ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts_ns)) END AS log_ret
           |  FROM bars)
           |SELECT symbol, ts_ns,
           |       round(CASE WHEN count(log_ret) OVER w = 20 THEN stddev_samp(log_ret) OVER w END, 6) AS volatility_20
           |FROM rets
           |WINDOW w AS (PARTITION BY symbol ORDER BY ts_ns ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
           |ORDER BY symbol, ts_ns""".stripMargin,
      "w7_prev_delta" ->
        s"""$barsCte, d AS (
           |  SELECT symbol, ts_ns, open,
           |         lag(close) OVER (PARTITION BY symbol ORDER BY ts_ns) AS prev_close
           |  FROM bars)
           |SELECT symbol, ts_ns, abs(open - prev_close) / prev_close AS rel_move
           |FROM d
           |WHERE prev_close IS NOT NULL AND prev_close <> 0
           |  AND abs(open - prev_close) / prev_close > 0.5
           |ORDER BY symbol, ts_ns""".stripMargin,
      "v_validation_rules" ->
        s"""$barsCte, ctx AS (
           |  SELECT *, lag(ts_ns) OVER (PARTITION BY symbol ORDER BY ts_ns, volume) AS prev_ts,
           |         lag(close) OVER (PARTITION BY symbol ORDER BY ts_ns, volume) AS prev_close,
           |         count(*) OVER (PARTITION BY symbol, ts_ns) AS dup_count
           |  FROM bars),
           |errs AS (
           |  SELECT 'non_monotonic_timestamp' AS reason FROM ctx WHERE prev_ts IS NOT NULL AND ts_ns <= prev_ts
           |  UNION ALL SELECT 'non_positive_price' FROM ctx WHERE least(open, high, low, close) <= 0
           |  UNION ALL SELECT 'negative_volume' FROM ctx WHERE volume < 0
           |  UNION ALL SELECT 'ohlc_inconsistent' FROM ctx WHERE NOT (high >= open AND high >= close AND high >= low AND low <= open AND low <= close)
           |  UNION ALL SELECT 'timestamp_not_minute_aligned' FROM ctx WHERE ts_ns % 60000000000 <> 0
           |  UNION ALL SELECT 'zero_volume_price_move' FROM ctx WHERE volume = 0 AND open <> close
           |  UNION ALL SELECT 'extreme_price_move' FROM ctx WHERE prev_close IS NOT NULL AND prev_close <> 0 AND abs(open - prev_close) / prev_close > 0.5
           |  UNION ALL SELECT 'unreasonable_volume' FROM ctx WHERE volume > 1000000000
           |  UNION ALL SELECT 'duplicate_timestamp' FROM ctx WHERE dup_count > 1)
           |SELECT reason, count(*) AS n FROM errs GROUP BY reason ORDER BY reason""".stripMargin,
      "w12_pair_covariance" ->
        s"""$barsCte,
           |la AS (
           |  SELECT bucket, CAST(floor(close * 10000 + 0.5) AS BIGINT) AS x FROM (
           |    SELECT ts_ns - ts_ns % 3600000000000 AS bucket, close,
           |           row_number() OVER (PARTITION BY ts_ns - ts_ns % 3600000000000
           |                              ORDER BY ts_ns DESC, close DESC) AS rn
           |    FROM bars WHERE symbol = '7') WHERE rn = 1),
           |lb AS (
           |  SELECT bucket, CAST(floor(close * 10000 + 0.5) AS BIGINT) AS y FROM (
           |    SELECT ts_ns - ts_ns % 3600000000000 AS bucket, close,
           |           row_number() OVER (PARTITION BY ts_ns - ts_ns % 3600000000000
           |                              ORDER BY ts_ns DESC, close DESC) AS rn
           |    FROM bars WHERE symbol = '11') WHERE rn = 1),
           |j AS (SELECT la.bucket, x, y FROM la JOIN lb ON la.bucket = lb.bucket)
           |SELECT count(*) AS n,
           |       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
           |       CAST(sum(x * y) AS BIGINT) AS sum_xy,
           |       CAST(sum(x * x) AS BIGINT) AS sum_xx,
           |       CAST(sum(y * y) AS BIGINT) AS sum_yy
           |FROM j""".stripMargin,
      "w9_trailing_patterns" ->
        s"""$barsCte, vb AS (
           |  SELECT symbol, ts_ns,
           |         CASE WHEN ts_ns % 7 = 0 THEN 0
           |              ELSE (ts_ns % 97 + 1) * (CASE WHEN ts_ns % 101 = 0 THEN 50 ELSE 1 END)
           |         END AS volume
           |  FROM bars),
           |flags AS (
           |  SELECT symbol, ts_ns, volume,
           |         sum(CASE WHEN volume = 0 THEN 1 ELSE 0 END)
           |           OVER (PARTITION BY symbol ORDER BY ts_ns ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) >= 5
           |           AS suspicious_zero_volume,
           |         avg(CASE WHEN volume > 0 THEN volume END)
           |           OVER (PARTITION BY symbol ORDER BY ts_ns ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
           |           AS avg_pos
           |  FROM vb)
           |SELECT symbol, ts_ns, suspicious_zero_volume,
           |       (avg_pos IS NOT NULL AND CAST(volume AS DOUBLE) > avg_pos * 10.0) AS volume_spike
           |FROM flags
           |WHERE suspicious_zero_volume OR (avg_pos IS NOT NULL AND CAST(volume AS DOUBLE) > avg_pos * 10.0)
           |ORDER BY symbol, ts_ns""".stripMargin,
      "a8_bucketed_trend" ->
        s"""$barsCte
           |SELECT ts_ns - ts_ns % 1800000000000 AS bucket_ts,
           |       CAST(sum(CAST(close AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_value,
           |       count(*) AS n
           |FROM bars GROUP BY 1 ORDER BY 1""".stripMargin
    )
  }

  private def resampleSql(w: Long): String =
    s"""$barsCte
       |SELECT symbol, ts_ns - ts_ns % $w AS ts_ns,
       |       arg_min(open, ts_ns) AS open, max(high) AS high,
       |       min(low) AS low, arg_max(close, ts_ns) AS close,
       |       CAST(sum(volume) AS BIGINT) AS volume
       |FROM bars GROUP BY 1, 2 ORDER BY symbol, 2""".stripMargin
}
