package graft.agg

import graft.core.FrameSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window OHLCV resampling — the engine's flagship operator.
  *
  * Semantics (ref: src/marketpipe/aggregation/domain/services.py:17-45):
  * per symbol, bucket = floor(ts_ns / frame_ns) * frame_ns;
  * open = first by ts_ns, high = max, low = min, close = last by ts_ns,
  * volume = sum. Output columns exactly (symbol, ts_ns, open, high, low,
  * close, volume), ordered by (symbol, ts_ns).
  *
  * Spark-first notes:
  *  - `first(x ORDER BY y)` ≡ `min_by(x, y)` because ts_ns is unique per
  *    (symbol, bucket) after dedup — no tie ambiguity (SURVEY §7.4.1).
  *  - One shuffle on (symbol, bucket); partial aggregation (map-side
  *    combine) happens for max/min/sum/min_by/max_by automatically, so at
  *    100 TB the shuffle carries one row per (symbol, bucket) per map task,
  *    not the raw bars.
  *  - No window functions: a groupBy aggregation scales strictly better
  *    (no per-partition sort of the full data).
  */
object Resampler {

  /** Floor a ts_ns column to a bucket boundary with pure integer math —
    * ns-since-epoch exceeds double's exact integer range (2^53), so
    * `floor(ts/w)*w` through doubles can mis-bucket; `ts - ts % w` cannot.
    */
  def bucketNs(ts: Column, widthNs: Long): Column =
    (ts - (ts % widthNs)).cast("long")

  /** Resample 1m (or finer) bars to `frame`. Input needs the 7-col core. */
  def resample(bars: DataFrame, frame: FrameSpec): DataFrame = {
    val w = frame.nanos
    bars
      .groupBy(col("symbol"), bucketNs(col("ts_ns"), w).as("bucket_ts"))
      .agg(
        min_by(col("open"), col("ts_ns")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("ts_ns")).as("close"),
        sum(col("volume")).as("volume")
      )
      .withColumnRenamed("bucket_ts", "ts_ns")
      .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
  }

  /** Daily bars with market-open-aligned labels: group by UTC calendar day
    * but label the bucket epoch(day) + 13.5h (13:30 UTC market open), in ns.
    * The 13.5h offset is fixed — deliberately no DST logic, matching the
    * reference literally (ref: aggregation/domain/services.py:16-30;
    * SURVEY §7.4.2).
    */
  def resampleDaily(bars: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val marketOpenNs = (13L * 3600L + 1800L) * 1000000000L // 13:30 UTC
    bars
      .groupBy(
        col("symbol"),
        (bucketNs(col("ts_ns"), dayNs) + marketOpenNs).as("bucket_ts"))
      .agg(
        min_by(col("open"), col("ts_ns")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("ts_ns")).as("close"),
        sum(col("volume")).as("volume")
      )
      .withColumnRenamed("bucket_ts", "ts_ns")
      .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
  }

  /** Resample to every default frame, returning (frame -> DataFrame). */
  def resampleAll(bars: DataFrame, frames: Seq[FrameSpec] = FrameSpec.defaults)
      : Map[String, DataFrame] =
    frames.map { f =>
      f.name -> (if (f.name == "1d") resampleDaily(bars) else resample(bars, f))
    }.toMap
}
