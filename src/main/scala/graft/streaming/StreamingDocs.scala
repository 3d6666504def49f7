package graft.streaming

import graft.datapipe.{Dedup, QualityRules, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

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
      // pushdown fence: see QualityRules.kept (alias substitution would
      // multiply the TextStats pass per metric reference)
      .where(graft.functions.PushdownBarrier.fence(
        size(col("failed_rules")) === 0))
      .drop("failed_rules")
  }

  /** Streaming incremental-LSH near-dup — the stream twin of
    * [[graft.datapipe.Dedup.incrementalLshCandidates]]: each micro-batch
    * is MinHash-banded (the portable md5 variant, so any engine verifies
    * the routing) and every document sharing AT LEAST ONE (band, bucket)
    * with the persisted corpus band index drops as a near-dup of the
    * existing corpus. Survivors and their band rows go to `sink`
    * (typically: append the docs to the corpus and the bands to the
    * index — `storedBands` is a thunk so a caller that appends can have
    * later batches dedup against earlier survivors too).
    *
    * Returns the configured [[DataStreamWriter]]; the caller sets the
    * checkpoint location / trigger and starts it.
    *
    * SINK CONTRACT (changed in round 11): the frames handed to `sink`
    * are backed by a per-batch [[graft.core.Materialize.FrontierScope]]
    * and are released — lineage-truncated, unrecomputable — the moment
    * `sink` returns. A sink MUST fully consume (write/collect) both
    * frames before returning; deferring consumption (async writers,
    * retained DataFrame references) fails at first touch after the
    * batch closes. This is what bounds streaming state to one batch.
    *
    * Scale shape (100 TB lens): banding a micro-batch is map + one
    * (id)-keyed combine over the batch only; the lookup is a
    * (band, bucket) semi-join to which the corpus contributes INDEX ROWS
    * only — never text or signatures. Streaming state is empty (the
    * index lives in a table, exactly like the batch incremental path).
    * Within-batch self-pairs are deliberately out of scope: corpus-
    * internal near-dup is the batch compaction pass's job
    * ([[graft.datapipe.Dedup.minhashLshCandidates]]).
    */
  def nearDupStream(
      docs: DataFrame,
      storedBands: () => DataFrame,
      k: Int = 16,
      bands: Int = 4,
      n: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id")(
      sink: (DataFrame, DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      // frontier the banded batch inside a per-batch scope: it feeds both
      // the dup lookup and the survivor band rows, and micro-batches are
      // executor-memory sized. The scope releases both checkpoints when
      // the batch closes — a streaming driver runs unbounded batches, so
      // waiting on GC + ContextCleaner accumulates dead blocks that
      // squeeze execution memory (2-5× tail slowdowns measured in the
      // 164-row bench sweep; worse over days of micro-batches). `sink`
      // must fully consume its frames before returning (it writes them —
      // the documented contract).
      graft.core.Materialize.withFrontiers { scope =>
        val banded = scope.frontier(Dedup
          .minhashBandsPortable(batch.toDF(), k, bands, n, textCol, idCol))
        val dupIds = scope.frontier(banded
          .join(storedBands().select(col("band"), col("bucket")),
            Seq("band", "bucket"), "left_semi")
          .select(col(idCol)).distinct())
        // docs too short to shingle have no band rows and can never
        // collide — they pass, matching the batch operator's semantics
        val kept = batch.toDF().join(dupIds, Seq(idCol), "left_anti")
        val keptBands = banded.join(dupIds, Seq(idCol), "left_anti")
        sink(kept, keptBands, batchId)
      }
    }
}
