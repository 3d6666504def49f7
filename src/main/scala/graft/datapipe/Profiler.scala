package graft.datapipe

import graft.core.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column profiler for data-quality triage over arbitrary tables: per
  * column — row count, nulls, distinct values, min/max (string-rendered),
  * and an exact mean for numerics (decimal accumulation, one division).
  *
  * Scale shape: ONE scan computes every column's aggregates in a single
  * grouped-aggregate pass (profiling 100 columns of a 100 TB table costs
  * one pass, not 100); the 1-row result is then reshaped to one row per
  * column from a materialized frontier so the scan is never re-executed.
  *
  * Distinct counts default to `approx_count_distinct` (HyperLogLog++):
  * multiple EXACT `countDistinct`s in one agg make Spark plan an `Expand`
  * that multiplies every input row by ~(k+1) before the exchange — a
  * ~101x intermediate-row blowup when profiling 100 columns — while the
  * sketches aggregate in one pass with no Expand. Pass
  * `exactDistinct = true` only for small/offline profiling where exact
  * cardinalities are worth the blowup.
  *
  * Exact mode runs as TWO one-row aggregates crossJoined into one plan:
  * the plain stats (nulls/min/max/mean — no Expand, one byte-proportional
  * pass) and the multi-distinct agg (Expand carries ONLY the k distinct
  * columns). Fused, Catalyst drags every min/max/sum accumulator through
  * the (k+1)x expanded rows too — measured 1.5x slower at sf1 than the
  * split, whose two scan stages are independent and schedule concurrently.
  * The input is also widened to CPU width first (identity when already
  * wide): the Expand multiplies rows BEFORE the partial aggregate, so a
  * byte-sized scan split hides (k+1)x the work behind one task.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exactDistinct: Boolean = false): DataFrame = {
    val targets = if (columns.nonEmpty) columns else df.columns.toSeq
    val in = if (exactDistinct) graft.core.Parallelism.widenForCpu(df) else df
    def statAggs(c: String) = {
      val isNum = in.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (isNum)
          sum(col(c).cast("decimal(28,6)")).cast("double") /
            count(col(c)).cast("double")
        else lit(null).cast("double")).as(s"${c}__mean"))
    }
    val combined =
      if (!exactDistinct) {
        val aggs = targets.flatMap(c =>
          statAggs(c) :+ approx_count_distinct(col(c)).as(s"${c}__distinct"))
        in.agg(count(lit(1)).as("__n"), aggs: _*)
      } else {
        val stats = in.agg(count(lit(1)).as("__n"),
          targets.flatMap(statAggs): _*)
        val distincts = in.agg(
          countDistinct(col(targets.head)).as(s"${targets.head}__distinct"),
          targets.tail.map(c => countDistinct(col(c)).as(s"${c}__distinct")): _*)
        stats.crossJoin(distincts) // 1 row x 1 row
      }
    val one = Materialize.frontier(combined)
    targets.map { c =>
      one.select(
        lit(c).as("column"),
        lit(df.schema(c).dataType.simpleString).as("dtype"),
        col("__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__mean").as("mean"))
    }.reduce(_ unionByName _)
  }
}
