package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-ingestion verification (ref:
  * src/marketpipe/ingestion/infrastructure/verification.py:43-233): did
  * each requested symbol actually land data covering the requested date
  * range, within a tolerance?
  *
  * One grouped aggregation over the store's partition/date columns for ALL
  * symbols at once (the reference loops a SQL query per symbol) — at 10k
  * symbols this is one shuffle of (symbol, date) pairs, not 10k queries.
  * Symbols with no data at all appear via the right join on the requested
  * list and fail with total_bars = 0.
  */
object IngestVerification {

  /** `bars` needs (symbol, date); `requested` is the symbol universe.
    * Output per requested symbol: actual bounds, count, passed, error.
    */
  def verify(
      bars: DataFrame,
      requested: Seq[String],
      requestedStart: String,
      requestedEnd: String,
      toleranceDays: Int = 1): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._
    val req = requested.map(_.toUpperCase).toDF("symbol")
    val bounds = bars
      .groupBy("symbol")
      .agg(
        min(col("date")).as("actual_start"),
        max(col("date")).as("actual_end"),
        count(lit(1)).as("total_bars"))
    val rs = to_date(lit(requestedStart)); val re = to_date(lit(requestedEnd))
    req.join(bounds, Seq("symbol"), "left")
      .withColumn("total_bars", coalesce(col("total_bars"), lit(0L)))
      .withColumn("passed",
        col("total_bars") > 0 &&
          datediff(col("actual_start"), rs) <= toleranceDays &&
          datediff(re, col("actual_end")) <= toleranceDays)
      .withColumn("error_message",
        when(col("total_bars") === 0, concat(lit("No data found for "), col("symbol")))
          .when(!col("passed"),
            concat(lit("Coverage "), col("actual_start"), lit(".."), col("actual_end"),
              lit(" misses requested "), lit(requestedStart), lit(".."), lit(requestedEnd))))
      .select("symbol", "actual_start", "actual_end", "total_bars", "passed", "error_message")
  }
}
