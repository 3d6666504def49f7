package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality validation ruleset — each rule yields error rows
  * (symbol, ts_ns, reason) identical to the reference
  * (ref: src/marketpipe/validation/domain/services.py:14-124; SURVEY §2.11).
  *
  * Implemented as column predicates assembled into an array of reason
  * strings, filtered and exploded — pure built-ins, fully codegen'd, one
  * window pass per symbol for the lag-based rules. No per-row UDFs.
  */
object RuleSet {

  /** reason -> predicate over a bars row (with prev_close/prev_ts lag cols
    * and dup_count already attached).
    */
  def rules: Seq[(String, Column)] = Seq(
    "non_monotonic_timestamp" ->
      (col("prev_ts").isNotNull && col("ts_ns") <= col("prev_ts")),
    "non_positive_price" ->
      (least(col("open"), col("high"), col("low"), col("close")) <= 0.0),
    "negative_volume" -> (col("volume") < 0),
    "ohlc_inconsistent" -> !(
      col("high") >= col("open") && col("high") >= col("close") &&
      col("high") >= col("low") && col("low") <= col("open") &&
      col("low") <= col("close")),
    "timestamp_not_minute_aligned" -> (col("ts_ns") % 60000000000L =!= 0L),
    "zero_volume_price_move" ->
      (col("volume") === 0 && col("open") =!= col("close")),
    "extreme_price_move" ->
      (col("prev_close").isNotNull && col("prev_close") =!= 0.0 &&
        abs(col("open") - col("prev_close")) / col("prev_close") > 0.5),
    "unreasonable_volume" -> (col("volume") > 1000000000L),
    "duplicate_timestamp" -> (col("dup_count") > 1)
  )

  /** Attach the context columns the rules need. Both windows partition by
    * symbol — the duplicate count uses a RANGE CURRENT ROW frame (peers of
    * the same ts_ns) instead of a (symbol, ts_ns) partition, so the whole
    * context needs ONE exchange, not two.
    */
  def withContext(bars: DataFrame): DataFrame = {
    val bySymbol = Window.partitionBy("symbol").orderBy("ts_ns", "volume")
    val peers = Window.partitionBy("symbol").orderBy("ts_ns")
      .rangeBetween(Window.currentRow, Window.currentRow)
    bars
      .withColumn("prev_ts", lag(col("ts_ns"), 1).over(bySymbol))
      .withColumn("prev_close", lag(col("close"), 1).over(bySymbol))
      .withColumn("dup_count", count(lit(1)).over(peers))
  }

  /** Error rows (symbol, ts_ns, reason) from a frame that ALREADY carries
    * the [[withContext]] columns — the shared-context half of [[splitCtx]].
    */
  private def errorsFromCtx(ctx: DataFrame): DataFrame = {
    val reasons = array(rules.map { case (name, pred) =>
      when(pred, lit(name)).otherwise(lit(null).cast("string"))
    }: _*)
    ctx
      .withColumn("reason", explode(filter(reasons, _.isNotNull)))
      .select("symbol", "ts_ns", "reason")
  }

  /** All error rows (symbol, ts_ns, reason) for a bars DataFrame. */
  def validate(bars: DataFrame): DataFrame = errorsFromCtx(withContext(bars))

  /** Split a frame that ALREADY carries the [[withContext]] columns into
    * (clean, errors). Both branches derive from the SAME plan node, so a
    * caller that caches `ctx` pays the per-symbol window exchange+sort
    * once for the whole job — clean rows, every resample frame, and the
    * error report all read the cached context instead of re-deriving
    * source + window per branch.
    */
  def splitCtx(ctx: DataFrame): (DataFrame, DataFrame) = {
    val anyError = rules.map(_._2).reduce(_ || _)
    val clean = ctx.where(!coalesce(anyError, lit(false)))
      .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
    (clean, errorsFromCtx(ctx))
  }

  /** Split into (clean, errors): clean rows are those with no error at all. */
  def split(bars: DataFrame): (DataFrame, DataFrame) = splitCtx(withContext(bars))

  /** Top-K error reasons (ref: validation/infrastructure/repositories.py:138-143). */
  def topErrors(errors: DataFrame, k: Int = 5): DataFrame =
    errors.groupBy("reason").count().orderBy(desc("count"), col("reason")).limit(k)
}
