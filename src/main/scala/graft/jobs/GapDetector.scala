package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap detection + backfill planning: expected-vs-existing trading days
  * per symbol (ref: src/marketpipe/ingestion/services/gap_detector.py:33-104;
  * SURVEY §2.7 U3, §2.9 T5/T6).
  *
  * Spark-first: the existing-day set comes from the partition listing
  * (`select distinct symbol, date`) — partition pruning means no data scan;
  * expected days = `sequence()` + `explode`, optionally weekday-filtered.
  */
object GapDetector {

  /** Missing (symbol, date) pairs in [start, end], weekdays only when
    * `tradingDaysOnly` (ref gap_detector weekday semantics).
    */
  def missingDays(
      bars: DataFrame,
      start: String,
      end: String,
      tradingDaysOnly: Boolean = false,
      symbolCol: String = "symbol",
      dateCol: String = "date"): DataFrame = {
    val symbols = bars.select(col(symbolCol)).distinct()
    var expected = symbols.crossJoin(
      bars.sparkSession.range(1).select(
        explode(sequence(to_date(lit(start)), to_date(lit(end)))).as(dateCol)))
    if (tradingDaysOnly)
      expected = expected.where(dayofweek(col(dateCol)).between(2, 6))
    val existing = bars.select(col(symbolCol), col(dateCol)).distinct()
    expected.except(existing)
  }

  /** Backfill plan: one (symbol, day) batch per gap, ordered oldest-first
    * (ref: cli/ohlcv_backfill.py:113-161 — each gap becomes one ingestion
    * job start=d, end=d+1).
    */
  def backfillPlan(gaps: DataFrame): DataFrame =
    gaps
      .withColumn("job_start", col("date"))
      .withColumn("job_end", date_add(col("date"), 1))
      .orderBy("symbol", "date")
}
