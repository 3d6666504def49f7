package graft.validate

import org.apache.spark.sql.DataFrame

/** Validation report sink: CSV per (job, symbol), header even when empty
  * (ref: src/marketpipe/validation/infrastructure/repositories.py:22-59).
  */
object CsvReportSink {
  def write(errors: DataFrame, reportRoot: String, jobId: String): Unit =
    errors
      .coalesce(1)
      .write
      .mode("overwrite")
      .option("header", "true")
      .partitionBy("symbol")
      .csv(s"$reportRoot/$jobId")
}
