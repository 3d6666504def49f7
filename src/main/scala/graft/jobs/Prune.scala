package graft.jobs

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retention pruning: delete partitions older than an age cutoff.
  * (ref: src/marketpipe/cli/prune.py:17-225)
  */
object Prune {

  /** Parse `30d` / `18m` / `5y` age expressions into a cutoff date
    * relative to `today` (ref: prune.py:17-35).
    */
  def cutoffDate(ageExpr: String, today: LocalDate): LocalDate = {
    val m = "^(\\d+)([dmy])$".r
    ageExpr.trim.toLowerCase match {
      case m(n, "d") => today.minusDays(n.toLong)
      case m(n, "m") => today.minusMonths(n.toLong)
      case m(n, "y") => today.minusYears(n.toLong)
      case other => throw new IllegalArgumentException(s"bad age expr: $other")
    }
  }

  /** Partitions (frame, symbol, date) strictly older than cutoff — a
    * metadata-only query over the partition columns (no data scan).
    */
  def prunablePartitions(store: DataFrame, cutoff: LocalDate): DataFrame =
    store
      .select("frame", "symbol", "date").distinct()
      .where(col("date") < to_date(lit(cutoff.toString)))

  /** Age-expression form of [[graft.core.Materialize.reapScratch]]: reap
    * materialization-scratch frontier dirs older than a `30d`/`2m`-style
    * cutoff (same parser as partition retention). Day granularity — for a
    * streaming driver's periodic hygiene tick, not sub-hour GC.
    */
  def reapScratch(spark: SparkSession, ageExpr: String,
                  today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): Long =
    graft.core.Materialize.reapScratch(spark,
      cutoffDate(ageExpr, today)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)

  /** Delete prunable partition directories. Destructive — driver-side
    * filesystem walk over exactly the partitions selected above.
    */
  def prunePaths(spark: SparkSession, root: String, parts: Seq[(String, String, String)]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    var deleted = 0L
    parts.foreach { case (frame, symbol, date) =>
      val p = new org.apache.hadoop.fs.Path(s"$root/frame=$frame/symbol=$symbol/date=$date")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p) && fs.delete(p, true)) deleted += 1
    }
    deleted
  }
}
