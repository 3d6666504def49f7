package graft.queries

import graft.core.FrameSpec
import graft.jobs.{GapDetector, Job, JobRepo, JobState}
import graft.pipeline.IngestPipeline
import graft.storage.ParquetStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable queries for the remaining operator surfaces that were
  * previously ScalaTest-only: the executing backfill loop (T6), partition
  * pruning as an observable (P4), recent-first file listing (O5), job
  * history order/limit (O6), date-from-path extraction (F11), standalone
  * re-aggregation, and the metrics dashboard rollup. Same discipline as
  * OrchestrationQueries: real writes/jobs against temp dirs, deterministic
  * inputs the DuckDB oracle regenerates from `range()`/VALUES.
  */
object SurfaceQueries {

  /** 2024-01-02T00:00Z in epoch ns. */
  private val startNs = 1704153600L * 1000000000L
  private val dayNs = 86400L * 1000000000L

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T6: the executing backfill loop — write days 1 and 3, detect the gap
    // from the partition index, run one real pipeline job per gap with
    // full job-state tracking, read back per-day bar counts + states.
    "t6_backfill_roundtrip" -> ((s, _) => {
      val root = tmp("graft_t6")
      val store = new ParquetStore(s, s"$root/raw")
      store.write(OrchestrationQueries.detBarsFrom(s, Seq("AAA" -> 0), 1440, startNs),
        FrameSpec.F1m)
      store.write(OrchestrationQueries.detBarsFrom(s, Seq("AAA" -> 0), 1440, startNs + 2 * dayNs),
        FrameSpec.F1m, mode = org.apache.spark.sql.SaveMode.Append)
      val plan = GapDetector.backfillPlan(
        GapDetector.missingDaysInStore(store, "1m", "2024-01-02", "2024-01-04")).collect()
      val repo = new JobRepo(s, s"$root/state/jobs")
      val pipe = new IngestPipeline(s, s"$root/raw", s"$root/agg",
        s"$root/reports", frames = Seq(FrameSpec.F5m))
      val now = 1700000000L
      plan.foreach { r =>
        val sym = r.getAs[String]("symbol")
        val day = r.getAs[java.sql.Date]("date").toString
        val jobId = s"${sym}_$day"
        repo.save(Seq(Job(jobId, sym, day, JobState.Pending, now, now)))
        repo.transition(jobId, JobState.InProgress, now + 1)
        val dayStart = java.time.LocalDate.parse(day)
          .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L
        pipe.runJob(OrchestrationQueries.detBarsFrom(s, Seq(sym -> 0), 390, dayStart), jobId)
        repo.transition(jobId, JobState.Completed, now + 2)
      }
      val states = repo.load()
        .select(col("job_id"), col("state"))
      val counts = s.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
        .groupBy("symbol", "date")
        .agg(count(lit(1)).as("n"), sum(col("volume")).as("vol"))
      counts.join(states,
          concat(col("symbol"), lit("_"), col("date").cast("string")) === col("job_id"),
          "left")
        .select(col("symbol"), col("date"), col("n"), col("vol"),
          coalesce(col("state"), lit("PREEXISTING")).as("state"))
        .orderBy("symbol", "date")
    }),

    // P4: partition pruning as a driver observable — the pruned load's
    // physical plan must carry non-empty PartitionFilters, and the row
    // count must equal exactly the surviving partition's rows.
    "p4_partition_pruned_scan" -> ((s, _) => {
      import s.implicits._
      val root = tmp("graft_p4")
      val store = new ParquetStore(s, root)
      store.write(OrchestrationQueries.detBars(s,
        Seq("AAA" -> 0, "BBB" -> 1), 2880), FrameSpec.F1m) // 2 days x 2 syms
      val pruned = store.load(FrameSpec.F1m, Seq("AAA"),
        startNs = Some(startNs + dayNs), endNs = Some(startNs + 2 * dayNs))
        .where(col("date") === "2024-01-03")
      val planStr = pruned.queryExecution.sparkPlan.toString
      val hasPartFilters =
        "PartitionFilters: \\[[^\\]]".r.findFirstIn(planStr).isDefined
      Seq((pruned.count(), hasPartFilters,
        pruned.agg(sum(col("volume"))).first().getLong(0)))
        .toDF("n_rows", "partition_filters_present", "vol")
    }),

    // O5: recent-first file listing — a compacted 2x2-partition store lists
    // exactly 4 data files, all non-empty, newest first.
    "o5_files_recent" -> ((s, _) => {
      import s.implicits._
      val root = tmp("graft_o5")
      val store = new ParquetStore(s, root)
      store.write(OrchestrationQueries.detBars(s,
        Seq("AAA" -> 0, "BBB" -> 1), 2880), FrameSpec.F1m,
        compactPartitions = true)
      val listed = store.listFilesRecent(10).collect()
      val modTimes = listed.map(_.getAs[Long]("mod_time")).toSeq
      Seq((listed.length.toLong,
        listed.forall(_.getAs[Long]("bytes") > 0L),
        modTimes == modTimes.sorted.reverse))
        .toDF("n_files", "all_nonempty", "newest_first")
    }),

    // O6: job history, most recently updated first with a limit (the
    // `jobs list` surface) — scripted updated_at values make the order
    // deterministic.
    "o6_job_history" -> ((s, _) => {
      val root = tmp("graft_o6")
      val repo = new JobRepo(s, root)
      val base = 1700000000L
      repo.save((1 to 5).map(i =>
        Job(s"job_$i", s"SYM$i", "2024-01-02", JobState.Pending, base, base + i * 10L)))
      repo.transition("job_2", JobState.InProgress, base + 100L)
      repo.load().orderBy(desc("updated_at"), col("job_id")).limit(3)
        .select("job_id", "state", "updated_at")
    }),

    // F11: date extraction from storage paths — date= partition prefix,
    // bare ISO date, year/month/day layout, and an undated path.
    "f11_date_from_path" -> ((s, _) => {
      import s.implicits._
      Seq(
        ("hive", "/store/frame=1m/symbol=AAA/date=2024-03-05/part-0.parquet"),
        ("bare", "/store/AAA/2024-03-05/part-0.parquet"),
        ("ymd", "/store/year=2024/month=03/day=05/part-0.parquet"),
        ("none", "/store/AAA/part-0.parquet"))
        .toDF("kind", "path")
        .select(col("kind"), ParquetStore.dateFromPath(col("path")).as("d"))
        .orderBy("kind")
    }),

    // F13: humanized sizes/durations — integer-arithmetic rendering, so
    // the exact strings are engine-reproducible.
    "f13_humanize" -> ((s, _) => {
      import s.implicits._
      Seq(
        (1L, 512L, 45L),
        (2L, 1536L, 200L),
        (3L, 2097152L, 7500L),
        (4L, 5368709120L, 93600L),
        (5L, 1649267441664L, 59L))
        .toDF("id", "bytes", "seconds")
        .select(col("id"),
          graft.functions.Humanize.bytes(col("bytes")).as("size"),
          graft.functions.Humanize.duration(col("seconds")).as("elapsed"))
        .orderBy("id")
    }),

    // Standalone re-aggregation: ingest once, wipe the aggregate store,
    // rebuild it from raw alone; the 5m view must match the original run.
    "agg_reaggregate" -> ((s, _) => {
      val root = tmp("graft_reagg")
      val pipe = new IngestPipeline(s, s"$root/raw", s"$root/agg",
        s"$root/reports", frames = Seq(FrameSpec.F5m))
      pipe.runJob(OrchestrationQueries.detBars(s, Seq("AAA" -> 0, "BBB" -> 1), 600),
        "first_run")
      def rmrf(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rmrf)
        java.nio.file.Files.deleteIfExists(p)
      }
      rmrf(java.nio.file.Paths.get(s"$root/agg"))
      pipe.reAggregate(framesSel = Seq(FrameSpec.F5m))
      pipe.query(
        """SELECT symbol, count(*) AS n_5m, sum(volume) AS vol,
          |       min(ts_ns) AS first_ts, max(ts_ns) AS last_ts
          |FROM bars_5m GROUP BY symbol ORDER BY symbol""".stripMargin)
    }),

    // Metrics dashboard rollup: deterministic samples across two
    // provider/feed pairs, per-(name, provider, feed) aggregates.
    "s12_metrics_dashboard" -> ((s, _) => {
      val root = tmp("graft_dash")
      val ms = new graft.metrics.MetricsStore(s, root)
      ms.record((0 until 12).map(i =>
        (1700000000L + i * 60L, "ingest_rate", 100.0 + i,
          if (i % 2 == 0) "alpha" else "beta", "bars")))
      ms.record((0 until 4).map(i =>
        (1700000000L + i * 60L, "errors", i.toDouble, "alpha", "bars")))
      ms.dashboard()
    })
  )

  def oracles: Map[String, String] = Map(
    "t6_backfill_roundtrip" ->
      s"""WITH days(date, n, pre) AS (VALUES
         |  (DATE '2024-01-02', 1440, true),
         |  (DATE '2024-01-03', 390, false),
         |  (DATE '2024-01-04', 1440, true)),
         |g AS (SELECT unnest(range(0, 1440)) AS i),
         |bars AS (
         |  SELECT d.date, d.pre, i
         |  FROM days d JOIN g ON g.i < d.n)
         |SELECT 'AAA' AS symbol, date, count(*) AS n,
         |       CAST(sum(i * 7919 % 997 + 1) AS BIGINT) AS vol,
         |       CASE WHEN pre THEN 'PREEXISTING' ELSE 'COMPLETED' END AS state
         |FROM bars GROUP BY date, pre ORDER BY date""".stripMargin,
    "p4_partition_pruned_scan" ->
      """SELECT CAST(1440 * 1 AS BIGINT) AS n_rows,
        |       true AS partition_filters_present,
        |       CAST((SELECT sum((i + 1440) * 7919 % 997 + 1)
        |             FROM (SELECT unnest(range(0, 1440)) AS i)) AS BIGINT) AS vol""".stripMargin,
    "o5_files_recent" ->
      """SELECT CAST(4 AS BIGINT) AS n_files, true AS all_nonempty,
        |       true AS newest_first""".stripMargin,
    "o6_job_history" ->
      """SELECT * FROM (VALUES
        |  ('job_2', 'IN_PROGRESS', CAST(1700000100 AS BIGINT)),
        |  ('job_5', 'PENDING', CAST(1700000050 AS BIGINT)),
        |  ('job_4', 'PENDING', CAST(1700000040 AS BIGINT)))
        |  AS t(job_id, state, updated_at)""".stripMargin,
    "f11_date_from_path" ->
      """SELECT * FROM (VALUES
        |  ('bare', DATE '2024-03-05'),
        |  ('hive', DATE '2024-03-05'),
        |  ('none', CAST(NULL AS DATE)),
        |  ('ymd', DATE '2024-03-05'))
        |  AS t(kind, d) ORDER BY kind""".stripMargin,
    "f13_humanize" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '512 B', '45s'),
        |  (CAST(2 AS BIGINT), '1.5 KiB', '3m 20s'),
        |  (CAST(3 AS BIGINT), '2.0 MiB', '2h 05m'),
        |  (CAST(4 AS BIGINT), '5.0 GiB', '1d 02h'),
        |  (CAST(5 AS BIGINT), '1.5 TiB', '59s'))
        |  AS t(id, size, elapsed) ORDER BY id""".stripMargin,
    "agg_reaggregate" ->
      s"""WITH ks(symbol, k) AS (VALUES ('AAA', 0), ('BBB', 1)),
         |g AS (SELECT unnest(range(0, 600)) AS i),
         |det AS (
         |  SELECT symbol, ${startNs}::BIGINT + i * 60000000000 AS ts_ns,
         |         (i + k*97) * 7919 % 997 + 1 AS volume
         |  FROM g CROSS JOIN ks),
         |b AS (
         |  SELECT symbol, ts_ns - ts_ns % 300000000000 AS bucket, volume
         |  FROM det)
         |SELECT symbol, count(DISTINCT bucket) AS n_5m,
         |       CAST(sum(volume) AS BIGINT) AS vol,
         |       min(bucket) AS first_ts, max(bucket) AS last_ts
         |FROM b GROUP BY symbol ORDER BY symbol""".stripMargin,
    "s12_metrics_dashboard" ->
      """WITH g AS (SELECT unnest(range(0, 12)) AS i),
        |ing AS (
        |  SELECT 'ingest_rate' AS name,
        |         CASE WHEN i % 2 = 0 THEN 'alpha' ELSE 'beta' END AS provider,
        |         'bars' AS feed, 1700000000 + i * 60 AS ts, 100.0 + i AS value
        |  FROM g),
        |err AS (
        |  SELECT 'errors' AS name, 'alpha' AS provider, 'bars' AS feed,
        |         1700000000 + i * 60 AS ts, CAST(i AS DOUBLE) AS value
        |  FROM g WHERE i < 4),
        |m AS (SELECT * FROM ing UNION ALL SELECT * FROM err)
        |SELECT name, provider, feed, count(*) AS n,
        |       avg(value) AS avg_value, min(value) AS min_value,
        |       max(value) AS max_value,
        |       arg_max(value, ts) AS latest_value,
        |       CAST(max(ts) AS BIGINT) AS latest_ts
        |FROM m GROUP BY name, provider, feed
        |ORDER BY name, provider, feed""".stripMargin
  )
}
