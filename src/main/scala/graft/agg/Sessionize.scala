package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — split each key's event stream into
  * sessions wherever the time between consecutive events exceeds `gap`,
  * and summarize per session. The batch twin of Structured Streaming's
  * `session_window` (which [[graft.streaming.StreamingIngest]]-style
  * jobs can use for the live path), and the standard first step of any
  * behavioral / clickstream pipeline over an events table.
  *
  * Shape: one shuffle on the `by` keys, one per-key sort shared by both
  * windows (`lag` to find the gaps, running `sum` to number sessions) —
  * Catalyst plans the two window functions over the same
  * (partition, order) spec in a single Window operator, so this costs
  * exactly one Exchange + Sort at any scale. Session numbering is
  * per-key (1-based in event-time order), so ids are deterministic and
  * engine-exact without any global coordination — no zipWithIndex, no
  * driver state, and keys sessionize independently (100 TB = more keys,
  * same per-key work).
  */
object Sessionize {

  /** Tag every event with its per-key session number (`session_seq`,
    * 1-based) and the gap-to-previous-event (`__gap_prev`, null for the
    * key's first event). `tsCol` may be any numeric/timestamp column;
    * `gap` must be comparable with its differences (interval for
    * timestamps, numeric for longs). Ties on `tsCol` are broken by
    * `tieCol` for a deterministic order.
    */
  def sessionize(events: DataFrame, by: Seq[String], tsCol: String,
                 gap: Column, tieCol: String): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__gap_prev", col(tsCol) - prev)
      .withColumn("__new_session",
        when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-session summary: event count, start/end timestamps, duration
    * and the sum of `valueCol`. One additional partial aggregate on
    * (by, session_seq) — map-side combinable, no extra sort.
    */
  def sessionSummary(events: DataFrame, by: Seq[String], tsCol: String,
                     gap: Column, tieCol: String,
                     valueCol: String): DataFrame =
    sessionize(events, by, tsCol, gap, tieCol)
      .groupBy((by :+ "session_seq").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
}
