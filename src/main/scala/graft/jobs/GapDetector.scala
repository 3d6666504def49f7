package graft.jobs

import graft.storage.ParquetStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap detection + backfill planning: expected-vs-existing trading days
  * per symbol (ref: src/marketpipe/ingestion/services/gap_detector.py:33-104;
  * SURVEY §2.7 U3, §2.9 T5/T6).
  *
  * Spark-first: expected days = `sequence()` + `explode`, optionally
  * weekday-filtered; the existing-day set comes either from an arbitrary
  * frame (ad-hoc data) or — the store path — from the partition DIRECTORY
  * index alone, so scanning a 100 TB store for gaps costs a directory
  * listing, not millions of parquet footer reads.
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
      dateCol: String = "date"): DataFrame =
    missingFromExisting(
      bars.select(col(symbolCol).as("symbol"), col(dateCol).as("date")),
      start, end, tradingDaysOnly)

  /** Store-backed gap detection: the existing set is the hive partition
    * listing (`ParquetStore.partitionDays`) — no parquet footer or data
    * reads at any store size.
    */
  def missingDaysInStore(
      store: ParquetStore,
      frameName: String,
      start: String,
      end: String,
      tradingDaysOnly: Boolean = false): DataFrame =
    missingFromExisting(store.partitionDays(frameName), start, end, tradingDaysOnly)

  private def missingFromExisting(
      existing: DataFrame,
      start: String,
      end: String,
      tradingDaysOnly: Boolean): DataFrame = {
    val symbols = existing.select(col("symbol")).distinct()
    var expected = symbols.crossJoin(
      existing.sparkSession.range(1).select(
        explode(sequence(to_date(lit(start)), to_date(lit(end)))).as("date")))
    if (tradingDaysOnly)
      expected = expected.where(dayofweek(col("date")).between(2, 6))
    expected.except(existing.select(col("symbol"), col("date")).distinct())
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
