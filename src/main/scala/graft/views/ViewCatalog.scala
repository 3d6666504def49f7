package graft.views

import graft.core.{FrameSpec, Schemas}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** SQL view surface: `bars_5m/15m/1h/4h/1d` temp views over the aggregated
  * store, with typed empty-view fallback when a frame has no data yet so
  * user SQL never errors.
  * (ref: src/marketpipe/aggregation/infrastructure/duckdb_views.py:34-87)
  */
final class ViewCatalog(spark: SparkSession, aggRoot: String) {

  def ensureViews(frames: Seq[FrameSpec] = FrameSpec.defaults): Unit = {
    // ONE scan of the store (file listing / partition discovery is the
    // expensive part), filtered per frame — not one listing per view
    val all: Option[DataFrame] =
      try Some(spark.read.option("basePath", aggRoot).parquet(aggRoot))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    frames.foreach { f =>
      val df = all.map(_.where(col("frame") === f.name)).getOrElse(emptyBars)
      df.createOrReplaceTempView(s"bars_${f.name}")
    }
  }

  def refreshViews(): Unit = ensureViews()

  /** Typed empty relation (ref: duckdb_views.py:43-51 NULL::VARCHAR … WHERE 1=0). */
  private def emptyBars: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.bars)

  /** Ad-hoc SQL entry point (ref: duckdb_views.py:98-125). Graft's native
    * functions (graft_dot_q, ...) are registered so user SQL can call them.
    */
  def query(sql: String): DataFrame = {
    require(sql.trim.nonEmpty, "empty SQL")
    graft.functions.GraftFunctions.register(spark)
    ensureViews()
    spark.sql(sql)
  }
}
