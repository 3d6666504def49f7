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
      // Materialize the cache with ONE job that is ALSO the error count
      // (double duty — no extra pass): the concurrent writers below then
      // read computed cache blocks instead of racing to compute them
      // (concurrent FIRST use of a cold cache double-computes partitions).
      val nErr = errors.count()
      val cleanObs = new org.apache.spark.sql.Observation()
      // The raw write, the frames write and the CSV report are
      // independent consumers of the one cached context — overlap them
      // from a small driver pool (guide §2.6: actions are only sequential
      // because the driver calls them sequentially; the next job's tasks
      // back-fill executors freed by the current job's tail, and the
      // driver-side output commits overlap the other job's compute).
      // Job descriptions are thread-local, so each job labels itself.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val sc = spark.sparkContext
        val fRaw = scala.concurrent.Future {
          sc.setJobDescription(s"ingest $jobId: raw write")
          // compactPartitions: without it each of the shuffle tasks writes
          // a sliver into every (frame, symbol, date) dir -> tens of
          // thousands of tiny files per job; with it, one file per
          // partition (the pre-write shuffle is tiny relative to
          // file-open cost)
          rawStore.write(clean.observe(cleanObs, count(lit(1)).as("n")),
            FrameSpec.F1m, compactPartitions = true)
        }
        val fAgg = scala.concurrent.Future {
          sc.setJobDescription(s"ingest $jobId: frames write")
          // all frames in ONE write: union the resampled frames (each
          // tagged with its frame partition value) -> single job, single
          // commit
          val allFrames = frames.map { f =>
            val agg = if (f.name == "1d") Resampler.resampleDaily(clean)
                      else Resampler.resample(clean, f)
            agg.withColumn("frame", lit(f.name))
          }.reduce(_ unionByName _)
          aggStore.writeFrames(allFrames, compactPartitions = true)
        }
        val fCsv = scala.concurrent.Future {
          sc.setJobDescription(s"ingest $jobId: error report")
          CsvReportSink.write(errors, reportRoot, jobId, knownCount = Some(nErr))
        }
        // wait for ALL THREE before failing: throwing while a sibling
        // write is in flight would hand a half-committed job to the
        // caller's recovery logic; dynamic partition overwrite keeps the
        // re-run idempotent either way
        val all = Seq(fRaw, fAgg, fCsv)
        all.foreach(f => scala.concurrent.Await.ready(
          f, scala.concurrent.duration.Duration.Inf))
        all.foreach(_.value.get.get) // rethrow the first failure, if any
      } finally pool.shutdown()
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
