package graft.validate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Validation report sink: CSV per (job, symbol), header-only file when a
  * job has zero errors (ref:
  * src/marketpipe/validation/infrastructure/repositories.py:22-59).
  *
  * Writes repartition BY symbol (not coalesce(1)): each symbol's file is
  * produced by the task that owns that symbol's rows, so a pathological
  * error day parallelizes across the cluster instead of serializing
  * through one thread — still exactly one file per symbol directory.
  */
object CsvReportSink {

  /** `knownCount`: a caller that already holds the error count (e.g. from
    * an Observation riding another action) passes it here so the
    * header-only decision costs zero extra jobs; None falls back to an
    * `isEmpty` probe.
    */
  def write(errors: DataFrame, reportRoot: String, jobId: String,
            knownCount: Option[Long] = None): Unit = {
    // clear any previous run's report first: a re-run with different (or
    // zero) error symbols must not leave stale per-symbol files behind —
    // and the session may be in dynamic partition-overwrite mode, which
    // would only replace the partitions present in THIS run
    val dir = new Path(s"$reportRoot/$jobId")
    val fs = dir.getFileSystem(errors.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    if (knownCount.map(_ == 0L).getOrElse(errors.isEmpty)) {
      // reference parity: an empty report still materializes with a header
      val out = fs.create(new Path(dir, "empty.csv"), true)
      out.write((errors.columns.mkString(",") + "\n").getBytes("UTF-8"))
      out.close()
    } else {
      errors
        .repartition(org.apache.spark.sql.functions.col("symbol"))
        .write
        .mode("overwrite")
        .option("header", "true")
        .partitionBy("symbol")
        .csv(s"$reportRoot/$jobId")
    }
  }

  /** Job ids with reports on disk (ref: ohlcv_validate.py --list). */
  def list(spark: SparkSession, reportRoot: String): Seq[String] = {
    val root = new Path(reportRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** Load one job's report back as a DataFrame (ref: --show). */
  def read(spark: SparkSession, reportRoot: String, jobId: String): DataFrame =
    spark.read.option("header", "true").csv(s"$reportRoot/$jobId")
}
