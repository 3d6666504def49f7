package graft.pipeline

import graft.agg.Resampler
import graft.core.FrameSpec
import graft.storage.ParquetStore
import graft.validate.{CsvReportSink, RuleSet}
import graft.views.ViewCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One ingestion job, end to end — the explicit-orchestration equivalent
  * of the reference's event bus flow `IngestionJobCompleted ->
  * {aggregation handler, validation handler}` (SURVEY §3.3):
  *
  *   source bars -> validation split -> raw write -> per-frame resample ->
  *   agg write -> view refresh (+ CSV error report).
  *
  * Symbol fan-out is task parallelism over partitions; the reference's
  * per-symbol asyncio loop disappears. Each stage is a pure DataFrame
  * function, so the streaming path reuses them via foreachBatch.
  */
final class IngestPipeline(
    spark: SparkSession,
    rawRoot: String,
    aggRoot: String,
    reportRoot: String,
    frames: Seq[FrameSpec] = FrameSpec.defaults) {

  private val rawStore = new ParquetStore(spark, rawRoot)
  private val aggStore = new ParquetStore(spark, aggRoot)
  private val views = new ViewCatalog(spark, aggRoot)

  /** Run one job over a batch of 1m bars. Returns (cleanCount, errorCount).
    * Idempotent: writes use dynamic partition overwrite, so re-running the
    * same job replaces its own partitions (T8).
    */
  def runJob(bars: DataFrame, jobId: String): (Long, Long) = {
    val (clean, errors) = RuleSet.split(bars)
    val cached = clean.cache()
    try {
      // compactPartitions: without it each of the shuffle tasks writes a
      // sliver into every (frame, symbol, date) dir -> tens of thousands
      // of tiny files per job; with it, one file per partition (the
      // pre-write shuffle is tiny relative to file-open cost)
      rawStore.write(cached, FrameSpec.F1m, compactPartitions = true)
      // all frames in ONE write: union the resampled frames (each tagged
      // with its frame partition value) -> single job, single commit
      import org.apache.spark.sql.functions.lit
      val allFrames = frames.map { f =>
        val agg = if (f.name == "1d") Resampler.resampleDaily(cached)
                  else Resampler.resample(cached, f)
        agg.withColumn("frame", lit(f.name))
      }.reduce(_ unionByName _)
      aggStore.writeFrames(allFrames, compactPartitions = true)
      // frontier (localCheckpoint locally): materialized once, GC-cleaned,
      // no session-long pin; scale path spills to scratch table/replicated
      // disk (same rationale as ScdMerge)
      val errMat = graft.core.Materialize.frontier(errors)
      val nErr = errMat.count()
      CsvReportSink.write(errMat, reportRoot, jobId) // header-only when clean
      views.refreshViews()
      (cached.count(), nErr)
    } finally cached.unpersist()
  }

  /** Ad-hoc SQL over the refreshed bars_* views. */
  def query(sql: String): DataFrame = views.query(sql)

  /** Standalone re-aggregation (ref: cli/ohlcv_aggregate.py:130-179): redo
    * the resample frames from the EXISTING raw store without re-ingesting —
    * after a frame-config change or a failed aggregation half of a job.
    * Scope by symbols and/or dates (both partition-pruned at the raw scan);
    * `framesSel` redoes a subset of frames. Dynamic partition overwrite
    * keeps it idempotent: exactly the re-derived partitions are replaced.
    * Returns the number of aggregate rows written.
    */
  def reAggregate(symbols: Seq[String] = Nil, dates: Seq[String] = Nil,
                  framesSel: Seq[FrameSpec] = frames): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    var raw = rawStore.load(FrameSpec.F1m, symbols)
    if (dates.nonEmpty) raw = raw.where(col("date").isin(dates: _*))
    val bars = raw.select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
    val cached = bars.cache()
    try {
      val allFrames = framesSel.map { f =>
        val agg = if (f.name == "1d") Resampler.resampleDaily(cached)
                  else Resampler.resample(cached, f)
        agg.withColumn("frame", lit(f.name))
      }.reduce(_ unionByName _).cache()
      try {
        aggStore.writeFrames(allFrames, compactPartitions = true)
        views.refreshViews()
        allFrames.count()
      } finally allFrames.unpersist()
    } finally cached.unpersist()
  }
}
