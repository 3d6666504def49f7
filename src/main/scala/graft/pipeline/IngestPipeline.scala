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
    // ONE validation-context pass, cached: the clean rows, every resample
    // frame AND the error report read this cache. Previously the errors
    // branch re-derived source + per-symbol window from scratch (a second
    // full pass + exchange — guide §2.4: share the exchange) and the
    // clean/error counts were two extra jobs; now the clean count rides
    // the raw write's own scan via Observation (guide §1.2: don't pay an
    // extra pass for a number an existing action already computes) and
    // the error count is a cache-backed scan that replaces the old
    // frontier materialization + count pair.
    val ctx = RuleSet.withContext(bars).cache()
    try {
      val (clean, errors) = RuleSet.splitCtx(ctx)
      import org.apache.spark.sql.functions.{count, lit}
      val cleanObs = new org.apache.spark.sql.Observation()
      // compactPartitions: without it each of the shuffle tasks writes a
      // sliver into every (frame, symbol, date) dir -> tens of thousands
      // of tiny files per job; with it, one file per partition (the
      // pre-write shuffle is tiny relative to file-open cost)
      rawStore.write(clean.observe(cleanObs, count(lit(1)).as("n")),
        FrameSpec.F1m, compactPartitions = true)
      // all frames in ONE write: union the resampled frames (each tagged
      // with its frame partition value) -> single job, single commit
      val allFrames = frames.map { f =>
        val agg = if (f.name == "1d") Resampler.resampleDaily(clean)
                  else Resampler.resample(clean, f)
        agg.withColumn("frame", lit(f.name))
      }.reduce(_ unionByName _)
      aggStore.writeFrames(allFrames, compactPartitions = true)
      val nErr = errors.count() // cache-backed; no frontier needed anymore
      CsvReportSink.write(errors, reportRoot, jobId, knownCount = Some(nErr))
      views.refreshViews()
      (cleanObs.get("n").asInstanceOf[Long], nErr)
    } finally ctx.unpersist()
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
      }.reduce(_ unionByName _)
      // the written-row count rides the write's own scan (Observation) —
      // allFrames is consumed exactly once, so the old cache + separate
      // count() pass bought nothing but an extra job and pinned blocks
      import org.apache.spark.sql.functions.count
      val obs = new org.apache.spark.sql.Observation()
      aggStore.writeFrames(allFrames.observe(obs, count(lit(1)).as("n")),
        compactPartitions = true)
      views.refreshViews()
      obs.get("n").asInstanceOf[Long]
    } finally cached.unpersist()
  }
}
