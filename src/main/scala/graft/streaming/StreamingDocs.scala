package graft.streaming

import graft.datapipe.{QualityRules, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document intake — the incremental-corpus twin of the batch
  * datapipe operators: documents arrive as a stream (crawl output, upload
  * queue) and each micro-batch exact-dedups WITHIN the event-time
  * watermark and quality-filters before landing.
  *
  * Division of labor at corpus scale: the stream holds only the recent
  * watermark window as dedup state (`dropDuplicatesWithinWatermark` —
  * bounded, evicted by event time), so in-flight duplicates (re-crawls,
  * retry storms) never land twice; dedup against EVERYTHING ever ingested
  * stays the batch anti-join vs the persisted fingerprint store
  * (`Dedup.incrementalExactKeep`) — unbounded history belongs in a table,
  * not in streaming state.
  *
  * Both stages are append-mode compatible: the dedup keeps bounded
  * per-key state; `QualityRules.annotate` is a pure map, so the whole
  * quality ruleset applies to a stream unchanged.
  */
object StreamingDocs {

  /** Kept documents only (quality-passing, first arrival per fingerprint
    * within the watermark), with the `QualityRules.withMetrics` columns
    * attached. `normalizeKey` = dedup on lower/trim-normalized text (the
    * batch exact-dedup key); false = raw-text fingerprint.
    */
  def curateStream(
      docs: DataFrame,
      cfg: QualityRules.Config = QualityRules.Config(),
      tsCol: String = "ingest_ts",
      watermark: String = "10 minutes",
      textCol: String = "text",
      normalizeKey: Boolean = true): DataFrame = {
    val fp =
      if (normalizeKey) TextAnalysis.fingerprintMd5(col(textCol))
      else md5(col(textCol).cast("binary"))
    docs
      .withColumn("fingerprint", fp)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .transform(d => QualityRules.annotate(d, cfg, textCol))
      .where(size(col("failed_rules")) === 0)
      .drop("failed_rules")
  }
}
