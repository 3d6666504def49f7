package graft.streaming

import graft.agg.Resampler
import graft.core.FrameSpec
import graft.validate.RuleSet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming ingest path — the streaming twin of the batch
  * pipeline, with the reference's micro-batch semantics (SURVEY §2.9):
  *
  * - T1 event-driven ingest->aggregate->validate: `foreachBatch` reusing
  *   the same pure batch functions (Resampler / RuleSet);
  * - T2 tumbling event-time windows with watermarking;
  * - T3 checkpoint/resume: Spark's checkpointLocation replaces the
  *   hand-rolled per-symbol checkpoint table;
  * - T4 late/duplicate data: `dropDuplicates` within the watermark.
  */
object StreamingIngest {

  /** Tumbling OHLCV aggregation on a *stream* of bar-shaped rows with a
    * `timestamp` column. Uses `window()` (event-time) + watermark; the
    * batch path keeps ts_ns arithmetic for oracle parity — semantics
    * identical because buckets are aligned to the epoch.
    */
  def streamingResample(
      bars: DataFrame, frame: FrameSpec,
      watermark: String = "10 minutes"): DataFrame =
    bars
      .withWatermark("timestamp", watermark)
      .dropDuplicates("symbol", "timestamp") // T4 within watermark
      .groupBy(col("symbol"), window(col("timestamp"), s"${frame.seconds} seconds"))
      .agg(
        min_by(col("open"), col("timestamp")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("timestamp")).as("close"),
        sum(col("volume")).as("volume"))
      .select(
        col("symbol"),
        (unix_micros(col("window.start")) * 1000L).as("ts_ns"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Gap-based sessionization on a *stream* — the live twin of
    * [[graft.agg.Sessionize]], via Spark's `session_window`. Spark's
    * native windows are half-open `[ts, ts+gap)`, which would SPLIT two
    * events exactly `gap` apart — the batch rule is inclusive (`ts -
    * prev > gap` splits, exactly-gap stays in-session). We close that
    * boundary by widening the native gap by 1 microsecond (Spark's
    * timestamp resolution): exactly-gap events now merge, and no pair
    * of distinct timestamps can fall strictly between `gap` and
    * `gap`+1µs, so every other merge decision is unchanged. With that,
    * a closed streaming session equals the batch session over the same
    * rows (window.start = min ts; window.end = max ts + gap + 1µs, the
    * state-eviction bound). Watermarking bounds session state: sessions
    * older than the watermark close and evict, so state is O(open
    * sessions), not O(history) — the property that makes this run
    * forever at scale.
    */
  def streamingSessions(
      events: DataFrame, by: Seq[String], tsCol: String, gap: String,
      valueCol: String, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), s"$gap 1 microsecond") +: by.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
      .select(by.map(col) ++ Seq(
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("session_start"), col("session_end"),
        col("sum_value")): _*)

  /** Stream-stream time-interval enrichment — the live twin of
    * [[graft.joins.AsofJoin]]'s backward match: each left event joined
    * to the right-stream events within `[left.ts - maxLag, left.ts]`
    * for the same key. Both sides are watermarked, and the interval
    * condition bounds the join state Spark must retain (right rows
    * older than `watermark + maxLag` are evicted) — the property that
    * lets this run indefinitely. Emits ALL in-window right rows
    * (downstream picks latest, counts, or averages); an exact
    * latest-only as-of needs the batch operator or a
    * flatMapGroupsWithState reduction — Spark caps chained stateful
    * ops, and an unbounded "latest ever" would mean unbounded state
    * anyway, which is exactly what the lag bound exists to forbid.
    *
    * Column contract: left has (key, ts, ...), right has (key, ts,
    * payload...); right's columns are suffixed `_r` to avoid collisions.
    */
  def streamIntervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      maxLag: String,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r0 = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"${c}_r"))
    val r = r0.withWatermark("ts_r", watermark)
    l.join(r,
      col(key) === col(s"${key}_r") &&
        col("ts_r") >= col("ts") - expr(s"INTERVAL $maxLag") &&
        col("ts_r") <= col("ts"),
      "leftOuter")
  }

  /** T1: the event-driven pipeline as foreachBatch — each micro-batch runs
    * the same pure functions the batch path uses: validate -> write raw ->
    * resample -> write agg. `onBatch` receives (cleanBars, errors,
    * resampled-by-frame).
    */
  def pipelineSink(
      bars: DataFrame,
      frames: Seq[FrameSpec],
      checkpointDir: String)(
      onBatch: (DataFrame, DataFrame, Map[String, DataFrame], Long) => Unit): DataStreamWriter[Row] =
    bars.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir) // T3
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (clean, errors) = RuleSet.split(batch)
        val resampled = frames.map(f => f.name -> Resampler.resample(clean, f)).toMap
        onBatch(clean, errors, resampled, id)
      }

  /** Per-symbol running state via mapGroupsWithState: tracks
    * last_processed ts_ns + running day volume — the streaming twin of the
    * SymbolBarsAggregate consistency boundary
    * (ref: src/marketpipe/domain/aggregates.py:20-146).
    */
  final case class SymbolState(lastTs: Long, dayVolume: Long, barCount: Long)
  final case class SymbolUpdate(symbol: String, lastTs: Long, dayVolume: Long, barCount: Long)
  final case class InBar(symbol: String, ts_ns: Long, volume: Long)

  def trackSymbolState(spark: SparkSession, bars: DataFrame): DataFrame = {
    import spark.implicits._
    bars.selectExpr("symbol", "ts_ns", "volume").as[InBar]
      .groupByKey(_.symbol)
      .mapGroupsWithState[SymbolState, SymbolUpdate](GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[InBar], state: GroupState[SymbolState]) =>
          val prev = state.getOption.getOrElse(SymbolState(Long.MinValue, 0L, 0L))
          var last = prev.lastTs; var vol = prev.dayVolume; var n = prev.barCount
          rows.foreach { b =>
            if (b.ts_ns > last) last = b.ts_ns // dup/late rows don't advance
            vol += b.volume; n += 1
          }
          val next = SymbolState(last, vol, n)
          state.update(next)
          SymbolUpdate(symbol, next.lastTs, next.dayVolume, next.barCount)
      }.toDF()
  }

  /** T5 streaming twin: live gap detection via flatMapGroupsWithState.
    * Per symbol, keeps the last seen bar timestamp; whenever a batch's
    * bars (sorted by ts) jump more than `barNs` past the previous bar, one
    * gap event (symbol, gap_start_ns, gap_end_ns, missing_bars) is emitted
    * immediately — the streaming analogue of `GapDetector.missingDays`,
    * without waiting for a batch scan. State is one long per symbol.
    */
  final case class GapState(lastTs: Long)
  final case class GapEvent(symbol: String, gap_start_ns: Long, gap_end_ns: Long,
                            missing_bars: Long)

  def detectGaps(spark: SparkSession, bars: DataFrame,
                 barNs: Long = 60000000000L): DataFrame = {
    import spark.implicits._
    bars.selectExpr("symbol", "ts_ns", "volume").as[InBar]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[GapState, GapEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[InBar], state: GroupState[GapState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_ns)
          var last = state.getOption.map(_.lastTs).getOrElse(Long.MinValue)
          val gaps = Seq.newBuilder[GapEvent]
          sorted.foreach { b =>
            if (last != Long.MinValue && b.ts_ns > last + barNs) {
              gaps += GapEvent(symbol, last + barNs, b.ts_ns,
                (b.ts_ns - last) / barNs - 1)
            }
            if (b.ts_ns > last) last = b.ts_ns
          }
          if (last != Long.MinValue) state.update(GapState(last))
          gaps.result().iterator
      }.toDF()
  }
}
