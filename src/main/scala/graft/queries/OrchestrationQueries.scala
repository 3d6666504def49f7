package graft.queries

import graft.core.FrameSpec
import graft.jobs.{Checkpoints, Job, JobRepo, JobState, Prune}
import graft.loader.LoadOhlcv
import graft.pipeline.IngestPipeline
import graft.storage.ParquetStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the write/orchestration operators (S3, S5,
  * S6, S7, S8, T1, T3, T7, T8, T9): each runs the real machinery —
  * partitioned writes, pipeline jobs, checkpoints, the job state machine,
  * retention pruning — against a temp directory, then emits a read-back
  * aggregate the DuckDB oracle can predict exactly.
  *
  * Input bars are pure integer arithmetic of (symbol index k, bar index i)
  * (the same family as the S13 fake wire server), so the oracle regenerates
  * them from `range()`:
  *   j      = i + 97 k
  *   ts_ns  = start + 60e9 i
  *   close  = (10000 + 37 j mod 5000) / 100,  open = same with j+1
  *   high   = max(open, close) + 0.5, low = min(open, close) - 0.5
  *   volume = 7919 j mod 997 + 1
  */
object OrchestrationQueries {

  /** 2024-01-02T00:00Z in epoch ns — the deterministic range start. */
  private val startNs = 1704153600L * 1000000000L

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Deterministic bars; `syms` maps symbol -> k offset. */
  private[queries] def detBars(s: SparkSession, syms: Seq[(String, Int)],
                               n: Int): DataFrame =
    detBarsFrom(s, syms, n, startNs)

  /** As [[detBars]] with an explicit range start (value columns depend only
    * on (i, k), so shifting the start moves timestamps alone).
    */
  private[queries] def detBarsFrom(s: SparkSession, syms: Seq[(String, Int)],
                                   n: Int, fromNs: Long): DataFrame = {
    import s.implicits._
    val symDf = syms.toDF("symbol", "k")
    s.range(n.toLong).toDF("i").crossJoin(broadcast(symDf))
      .withColumn("j", col("i") + col("k") * 97L)
      .withColumn("ts_ns", lit(fromNs) + col("i") * 60000000000L)
      .withColumn("open",
        (lit(10000L) + ((col("j") + 1L) * 37L) % 5000L).cast("double") / 100.0)
      .withColumn("close",
        (lit(10000L) + (col("j") * 37L) % 5000L).cast("double") / 100.0)
      .withColumn("high", greatest(col("open"), col("close")) + 0.5)
      .withColumn("low", least(col("open"), col("close")) - 0.5)
      .withColumn("volume", (col("j") * 7919L) % 997L + 1L)
      .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
  }

  /** The same bars as a DuckDB CTE named `det`. */
  private def detCte(syms: Seq[(String, Int)], n: Int): String = {
    val vals = syms.map { case (s, k) => s"('$s', $k)" }.mkString(", ")
    s"""WITH ks(symbol, k) AS (VALUES $vals),
       |g AS (SELECT unnest(range(0, $n)) AS i),
       |det0 AS (
       |  SELECT symbol, $startNs + i * 60000000000 AS ts_ns,
       |         (10000 + ((i + k*97 + 1) * 37) % 5000) / 100.0 AS open,
       |         (10000 + ((i + k*97) * 37) % 5000) / 100.0 AS close,
       |         (i + k*97) * 7919 % 997 + 1 AS volume
       |  FROM g CROSS JOIN ks),
       |det AS (
       |  SELECT symbol, ts_ns, open, close,
       |         greatest(open, close) + 0.5 AS high,
       |         least(open, close) - 0.5 AS low, volume,
       |         CAST(make_timestamp(ts_ns // 1000) AS DATE) AS date
       |  FROM det0)""".stripMargin
  }

  private val twoSyms = Seq("AAA" -> 0, "BBB" -> 1)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3 + S6 + T8: partitioned zstd write (2000 bars spanning 2 dates),
    // written TWICE (idempotent dynamic overwrite), read back with a
    // symbol+date-pruned load. Counts must equal a single write's.
    "s3_write_roundtrip_idempotent" -> ((s, _) => {
      val root = tmp("graft_s3")
      val store = new ParquetStore(s, root)
      val bars = detBars(s, twoSyms, 2000)
      store.write(bars, FrameSpec.F1m, compactPartitions = true)
      store.write(bars, FrameSpec.F1m, compactPartitions = true) // rerun: same partitions
      store.load(FrameSpec.F1m, Seq("AAA", "BBB"))
        .groupBy("symbol", "date")
        .agg(count(lit(1)).as("n"), sum(col("volume")).as("vol"),
          sum(col("close").cast("decimal(18,2)")).cast("double").as("sum_close"))
        .orderBy("symbol", "date")
    }),

    // S5 + T1 + S11: the full ingestion pipeline (validate -> raw write ->
    // multi-frame resample -> agg write -> view refresh), then the bars_5m
    // view read back. Deterministic bars pass every rule, so clean = all.
    "s5_pipeline_roundtrip" -> ((s, _) => {
      val root = tmp("graft_s5")
      // two frames keep the multi-frame union write path exercised while
      // the query stays cheap (the full 5-frame set is IngestPipelineSpec's
      // job; this run's observable is the bars_5m view)
      val pipe = new IngestPipeline(s, s"$root/raw", s"$root/agg", s"$root/reports",
        frames = Seq(FrameSpec.F5m, FrameSpec.F1d))
      pipe.runJob(detBars(s, twoSyms, 600), "det_job")
      pipe.query(
        """SELECT symbol, count(*) AS n_5m, sum(volume) AS vol,
          |       min(ts_ns) AS first_ts, max(ts_ns) AS last_ts
          |FROM bars_5m GROUP BY symbol ORDER BY symbol""".stripMargin)
    }),

    // S7: the public load_ohlcv API over a written store with a ts window.
    "s7_load_ohlcv_window" -> ((s, _) => {
      val root = tmp("graft_s7")
      new ParquetStore(s, root).write(detBars(s, twoSyms, 500), FrameSpec.F1m)
      LoadOhlcv(s, root, Seq("aaa", "bbb"), "1m",
        startNs + 100L * 60000000000L, startNs + 400L * 60000000000L)
        .groupBy("symbol")
        .agg(count(lit(1)).as("n"), min("ts_ns").as("first_ts"),
          sum(col("open").cast("decimal(18,2)")).cast("double").as("sum_open"))
        .orderBy("symbol")
    }),

    // S8: SCD dimension written year/month-partitioned, read back grouped
    // by the partition columns (reuses the scd2_merge scenario).
    "s8_scd_write_roundtrip" -> ((s, dir) => {
      val root = tmp("graft_s8")
      val merged = graft.symbols.ScdMerge.merge(
        ScdQueries.masterFor(s, dir), ScdQueries.snapshotFor(s, dir), "2024-06-01")
      graft.symbols.ScdMerge.write(s, merged, root)
      s.read.option("basePath", root).parquet(root)
        .groupBy(col("year").cast("long").as("year"),
          col("month").cast("long").as("month"))
        .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("ids"))
        .orderBy("year", "month")
    }),

    // T3: checkpoint save + resume-window computation for in-window,
    // stale (before window) and beyond-window checkpoints.
    "t3_checkpoint_resume" -> ((s, _) => {
      import s.implicits._
      val root = tmp("graft_t3")
      val cp = new Checkpoints(s, root)
      val bar = 60000000000L
      cp.save(Seq(
        ("IN_WINDOW", startNs + 50L * bar),
        ("STALE", startNs - 10L * bar),
        ("BEYOND", startNs + 5000L * bar)).toDF("symbol", "last_ts_ns"))
      val windows = Seq("IN_WINDOW", "STALE", "BEYOND", "ABSENT")
      windows.map { sym =>
        (sym, cp.resumeFrom(sym, startNs, startNs + 1000L * bar))
      }.toDF("symbol", "resume_ns").orderBy("symbol")
    }),

    // T7 + A14: scripted job lifecycle through the append-log repo; the
    // latest-wins histogram is the observable.
    "t7_job_state_machine" -> ((s, _) => {
      val root = tmp("graft_t7")
      val repo = new JobRepo(s, root)
      val now = 1700000000L
      repo.save((1 to 5).map(i =>
        Job(s"job_$i", s"SYM$i", "2024-01-02", JobState.Pending, now, now)))
      Seq(1, 2, 3, 4).foreach(i => repo.transition(s"job_$i", JobState.InProgress, now + 1))
      Seq(1, 2).foreach(i => repo.transition(s"job_$i", JobState.Completed, now + 2))
      repo.transition("job_3", JobState.Failed, now + 2)
      repo.transition("job_5", JobState.Cancelled, now + 1)
      repo.histogram()
    }),

    // S2: empty-view fallback — a catalog over a store with no data still
    // answers SQL with the typed empty frame.
    "s2_empty_view_fallback" -> ((s, _) => {
      val root = tmp("graft_s2")
      val views = new graft.views.ViewCatalog(s, s"$root/agg")
      val empty = views.query("SELECT * FROM bars_1h")
      import s.implicits._
      Seq((empty.count(), empty.columns.length.toLong))
        .toDF("n_rows", "n_cols")
    }),

    // S9: CSV report sink round-trip — one injected bad bar produces one
    // error row; the report reads back with its reason.
    "s9_report_roundtrip" -> ((s, _) => {
      import s.implicits._
      val root = tmp("graft_s9")
      val bad = Seq(("AAA", startNs + 10000L * 60000000000L,
        100.0, 100.5, 99.5, 100.0, -5L))
        .toDF("symbol", "ts_ns", "open", "high", "low", "close", "volume")
      val pipe = new IngestPipeline(s, s"$root/raw", s"$root/agg", s"$root/reports")
      pipe.runJob(detBars(s, Seq("AAA" -> 0), 200).unionByName(bad), "badjob")
      graft.validate.CsvReportSink.read(s, s"$root/reports", "badjob")
        .groupBy("reason").agg(count(lit(1)).as("n")).orderBy("reason")
    }),

    // S12: metrics row-store round-trip — two append batches, summarized.
    "s12_metrics_roundtrip" -> ((s, _) => {
      val root = tmp("graft_s12")
      val ms = new graft.metrics.MetricsStore(s, root)
      ms.record((0 until 10).map(i =>
        (1700000000L + i * 60L, "bars_ingested", 100.0 + i, "prov", "feed")))
      ms.record((0 until 5).map(i =>
        (1700000000L + i * 60L, "errors", i.toDouble, "prov", "feed")))
      ms.summary()
    }),

    // S14: seeded synthetic source determinism — two generations with the
    // same seed are row-identical.
    "s14_synthetic_determinism" -> ((s, _) => {
      import s.implicits._
      val a = graft.gen.SyntheticSource.bars(s, Seq("AAPL", "MSFT"),
        startNs, 400, seed = 42L)
      val b = graft.gen.SyntheticSource.bars(s, Seq("AAPL", "MSFT"),
        startNs, 400, seed = 42L)
      val equal = a.join(b, Seq("symbol", "ts_ns", "open", "high", "low", "close", "volume"))
        .count()
      Seq((a.count(), equal)).toDF("n_total", "n_equal")
    }),

    // A11: storage stats — compacted write yields exactly one file per
    // (frame, symbol, date) partition; stats sees the file index only.
    "a11_storage_stats" -> ((s, _) => {
      import s.implicits._
      val root = tmp("graft_a11")
      val store = new ParquetStore(s, root)
      store.write(detBars(s, Seq("AAA" -> 0), 2000), FrameSpec.F1m,
        compactPartitions = true)
      val files = store.stats().collect()(0).getAs[Long]("files")
      val rows = store.load(FrameSpec.F1m).count()
      Seq((files, rows)).toDF("files", "rows")
    }),

    // F10: age-expression parsing against a pinned 'today'.
    "f10_age_expr" -> ((s, _) => {
      import s.implicits._
      val today = java.time.LocalDate.parse("2026-08-12")
      Seq("30d", "18m", "5y").map(e =>
        (e, java.sql.Date.valueOf(Prune.cutoffDate(e, today))))
        .toDF("expr", "cutoff").orderBy("expr")
    }),

    // T2: streaming tumbling event-time resample over a MemoryStream of
    // the deterministic bars — the oracle recomputes the same buckets.
    "t2_streaming_resample" -> ((s, _) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = MemoryStream[(String, Long, Double, Double, Double, Double, Long)]
      val rows = detBars(s, Seq("SSS" -> 3), 300).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6)))
      mem.addData(rows.toSeq)
      val bars = mem.toDF()
        .toDF("symbol", "ts_ns", "open", "high", "low", "close", "volume")
        .withColumn("timestamp",
          timestamp_micros(expr("ts_ns div 1000")))
        .drop("ts_ns")
      val out = graft.streaming.StreamingIngest.streamingResample(bars, FrameSpec.F5m)
      val q = out.writeStream.format("memory").queryName("t2_stream_sink")
        .outputMode("complete")
        .option("checkpointLocation", tmp("graft_t2_ckpt")).start()
      try q.processAllAvailable() finally q.stop()
      s.sql("SELECT * FROM t2_stream_sink ORDER BY symbol, ts_ns")
    }),

    // Post-ingestion verification: one requested symbol fully covered, one
    // covered but short of the requested end, one with no data at all.
    "v2_post_ingest_verification" -> ((s, _) => {
      val root = tmp("graft_v2")
      val store = new ParquetStore(s, root)
      // AAA: 2 full days (2024-01-02/03); DDD: day 1 only
      store.write(detBars(s, Seq("AAA" -> 0), 2880), FrameSpec.F1m)
      store.write(detBars(s, Seq("DDD" -> 4), 1440), FrameSpec.F1m,
        mode = org.apache.spark.sql.SaveMode.Append)
      graft.validate.IngestVerification.verify(
        s.read.option("basePath", root).parquet(root),
        Seq("AAA", "DDD", "MISSING"),
        "2024-01-02", "2024-01-03", toleranceDays = 0)
        .orderBy("symbol")
    }),

    // T9: retention prune — write 3 days of bars, select + delete
    // partitions before day 2, read back the survivors.
    "t9_prune_roundtrip" -> ((s, _) => {
      val root = tmp("graft_t9")
      val store = new ParquetStore(s, root)
      store.write(detBars(s, Seq("CCC" -> 2), 3000), FrameSpec.F1m) // ~2.1 days
      val cutoff = java.time.LocalDate.parse("2024-01-03")
      val parts = Prune.prunablePartitions(
        s.read.option("basePath", root).parquet(root), cutoff)
        .collect().map(r => (r.getAs[String]("frame"), r.getAs[String]("symbol"),
          r.getAs[java.sql.Date]("date").toString)).toSeq
      Prune.prunePaths(s, root, parts)
      s.read.option("basePath", root).parquet(root)
        .groupBy("symbol", "date")
        .agg(count(lit(1)).as("n"), sum(col("volume")).as("vol"))
        .orderBy("symbol", "date")
    })
  )

  def oracles: Map[String, String] = Map(
    "s3_write_roundtrip_idempotent" ->
      s"""${detCte(twoSyms, 2000)}
         |SELECT symbol, date, count(*) AS n,
         |       CAST(sum(volume) AS BIGINT) AS vol,
         |       CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) AS sum_close
         |FROM det GROUP BY symbol, date ORDER BY symbol, date""".stripMargin,
    "s5_pipeline_roundtrip" ->
      s"""${detCte(twoSyms, 600)}
         |SELECT symbol, count(DISTINCT bucket) AS n_5m,
         |       CAST(sum(volume) AS BIGINT) AS vol,
         |       min(bucket) AS first_ts, max(bucket) AS last_ts
         |FROM (
         |  SELECT symbol, ts_ns - ts_ns % 300000000000 AS bucket, volume
         |  FROM det)
         |GROUP BY symbol ORDER BY symbol""".stripMargin,
    "s7_load_ohlcv_window" ->
      s"""${detCte(twoSyms, 500)}
         |SELECT symbol, count(*) AS n, min(ts_ns) AS first_ts,
         |       CAST(sum(CAST(open AS DECIMAL(18,2))) AS DOUBLE) AS sum_open
         |FROM det
         |WHERE ts_ns >= $startNs + 100 * 60000000000
         |  AND ts_ns <  $startNs + 400 * 60000000000
         |GROUP BY symbol ORDER BY symbol""".stripMargin,
    "s8_scd_write_roundtrip" ->
      s"""${ScdQueries.mergedCte}
         |SELECT year(valid_from) AS year, month(valid_from) AS month,
         |       count(*) AS n, count(DISTINCT id) AS ids
         |FROM merged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t3_checkpoint_resume" ->
      s"""SELECT * FROM (VALUES
         |  ('ABSENT', $startNs),
         |  ('BEYOND', $startNs),
         |  ('IN_WINDOW', $startNs + 51 * 60000000000),
         |  ('STALE', $startNs)) t(symbol, resume_ns)
         |ORDER BY symbol""".stripMargin,
    "t7_job_state_machine" ->
      """SELECT * FROM (VALUES
        |  ('CANCELLED', CAST(1 AS BIGINT)),
        |  ('COMPLETED', CAST(2 AS BIGINT)),
        |  ('FAILED', CAST(1 AS BIGINT)),
        |  ('IN_PROGRESS', CAST(1 AS BIGINT))) t(state, count)
        |ORDER BY state""".stripMargin,
    "t9_prune_roundtrip" ->
      s"""${detCte(Seq("CCC" -> 2), 3000)}
         |SELECT symbol, date, count(*) AS n, CAST(sum(volume) AS BIGINT) AS vol
         |FROM det WHERE date >= DATE '2024-01-03'
         |GROUP BY symbol, date ORDER BY symbol, date""".stripMargin,
    "s2_empty_view_fallback" ->
      "SELECT CAST(0 AS BIGINT) AS n_rows, CAST(7 AS BIGINT) AS n_cols",
    "v2_post_ingest_verification" ->
      """SELECT * FROM (VALUES
        |  ('AAA', DATE '2024-01-02', DATE '2024-01-03', CAST(2880 AS BIGINT), true, CAST(NULL AS VARCHAR)),
        |  ('DDD', DATE '2024-01-02', DATE '2024-01-02', CAST(1440 AS BIGINT), false,
        |   'Coverage 2024-01-02..2024-01-02 misses requested 2024-01-02..2024-01-03'),
        |  ('MISSING', CAST(NULL AS DATE), CAST(NULL AS DATE), CAST(0 AS BIGINT), false,
        |   'No data found for MISSING'))
        |  t(symbol, actual_start, actual_end, total_bars, passed, error_message)
        |ORDER BY symbol""".stripMargin,
    "s9_report_roundtrip" ->
      """SELECT 'negative_volume' AS reason, CAST(1 AS BIGINT) AS n""",
    "s12_metrics_roundtrip" ->
      """WITH m AS (
        |  SELECT 1700000000 + i * 60 AS ts, 'bars_ingested' AS name,
        |         100.0 + i AS value FROM (SELECT unnest(range(0, 10)) AS i)
        |  UNION ALL
        |  SELECT 1700000000 + i * 60, 'errors', CAST(i AS DOUBLE)
        |  FROM (SELECT unnest(range(0, 5)) AS i))
        |SELECT name, count(*) AS n, avg(value) AS avg_value,
        |       min(value) AS min_value, max(value) AS max_value,
        |       arg_max(value, ts) AS latest_value,
        |       CAST(max(ts) AS BIGINT) AS latest_ts
        |FROM m GROUP BY name ORDER BY name""".stripMargin,
    "s14_synthetic_determinism" ->
      "SELECT CAST(800 AS BIGINT) AS n_total, CAST(800 AS BIGINT) AS n_equal",
    "a11_storage_stats" ->
      "SELECT CAST(2 AS BIGINT) AS files, CAST(2000 AS BIGINT) AS rows",
    "f10_age_expr" ->
      """SELECT * FROM (VALUES
        |  ('18m', DATE '2025-02-12'),
        |  ('30d', DATE '2026-07-13'),
        |  ('5y', DATE '2021-08-12')) t(expr, cutoff)
        |ORDER BY expr""".stripMargin,
    "t2_streaming_resample" ->
      s"""${detCte(Seq("SSS" -> 3), 300)}
         |SELECT symbol, bucket AS ts_ns, arg_min(open, ts_ns) AS open,
         |       max(high) AS high, min(low) AS low,
         |       arg_max(close, ts_ns) AS close,
         |       CAST(sum(volume) AS BIGINT) AS volume
         |FROM (SELECT *, ts_ns - ts_ns % 300000000000 AS bucket FROM det)
         |GROUP BY symbol, bucket ORDER BY symbol, ts_ns""".stripMargin
  )
}
