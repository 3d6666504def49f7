package graft.cli

import graft.core.FrameSpec
import graft.gen.SyntheticSource
import graft.jobs.{GapDetector, Job, JobRepo, JobState, Prune}
import graft.metrics.MetricsStore
import graft.pipeline.IngestPipeline
import graft.validate.{CsvReportSink, RuleSet}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI mirroring the reference's command surface (ref: src/marketpipe/cli/):
  *
  *   ingest    <dataRoot> <symbols,csv> <startIsoDate> <nBars>
  *   aggregate <dataRoot> [--frame f] [--symbol s] [--job SYM_DATE]
  *                                                       (ref ohlcv_aggregate.py:130-179)
  *   query     <dataRoot> <sql> [limit] [--csv|--md]     (ref query.py:40-65)
  *   validate  <dataRoot> [--list | --show <jobId>]      (ref ohlcv_validate.py)
  *   backfill  <dataRoot> <start> <end> [symbols,csv]    (ref ohlcv_backfill.py:113-161)
  *   prune     <dataRoot> <ageExpr> [--dry-run]          (ref prune.py:41-330)
  *   jobs      <dataRoot> list|status|cleanup [ageExpr]  (ref jobs.py:163-189,519-535)
  *   metrics   <dataRoot> list|summary|avg|trend|dashboard
  *   symbols   <dataRoot> [update --provider p --as-of d [--dry-run]]
  *   gaps      <dataRoot> <start> <end>
  *   demo      <dataRoot> | stream-demo
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "ingest" :: root :: syms :: start :: nBars :: Nil =>
      ingest(session(), root, syms.split(",").toSeq, start, nBars.toInt)

    case "ingest" :: root :: syms :: start :: nBars :: "--provider" :: prov :: Nil =>
      // provider-driven ingest (ref: cli/ohlcv_ingest.py --provider): the
      // registry resolves the vendor dialect; endpoint/key come from
      // GRAFT_PROVIDER_URL / GRAFT_API_KEY (the "fake" provider needs
      // neither — its dialect client wraps an in-process wire server)
      ingestVia(session(), root, prov, syms.split(",").toSeq, start, nBars.toInt)

    case "ingest" :: "--config" :: path :: Nil =>
      // config-driven ingest (ref: cli/ohlcv_ingest.py --config): one job
      // per day in [start, end], weekdays only
      val cfg = graft.config.IngestConfig.load(path)
      val spark = session()
      var d = java.time.LocalDate.parse(cfg.start)
      val end = java.time.LocalDate.parse(cfg.end)
      while (!d.isAfter(end)) {
        val dow = d.getDayOfWeek.getValue
        if (dow <= 5) ingest(spark, cfg.outputPath, cfg.symbols, d.toString, 390)
        d = d.plusDays(1)
      }

    case "query" :: root :: sql :: rest =>
      val spark = session()
      val limit = rest.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(50)
      val df = new IngestPipeline(spark, s"$root/raw", s"$root/agg", s"$root/reports")
        .query(sql)
      if (rest.contains("--csv")) printCsv(df, limit)
      else if (rest.contains("--md")) printMarkdown(df, limit)
      else df.show(limit, truncate = false)

    case "aggregate" :: root :: rest =>
      // standalone re-aggregation from the existing raw store (ref:
      // cli/ohlcv_aggregate.py:130-179): all frames, or --frame <f>;
      // --job SYMBOL_YYYY-MM-DD scopes one ingestion job's partitions
      val spark = session()
      def opt(flag: String): Option[String] =
        rest.dropWhile(_ != flag).drop(1).headOption
      val (symbols, dates) = opt("--job") match {
        case Some(jobId) =>
          // ids are SYMS_YYYY-MM-DD or SYMS_YYYY-MM-DD_provider — find the
          // date by shape, not position, and validate it (a positional
          // split silently treats a provider suffix as the date)
          val day = "\\d{4}-\\d{2}-\\d{2}".r.findFirstIn(jobId).getOrElse(
            throw new IllegalArgumentException(
              s"--job id '$jobId' has no YYYY-MM-DD date component"))
          java.time.LocalDate.parse(day) // hard-fail on 2024-13-99 shapes
          val sym = jobId.substring(0, jobId.indexOf(day)).stripSuffix("_")
          (sym.split("[_,]").filter(_.nonEmpty).toSeq, Seq(day))
        case None => (opt("--symbol").map(_.split(",").toSeq).getOrElse(Nil), Nil)
      }
      val framesSel = opt("--frame") match {
        case Some(f) => FrameSpec.defaults.filter(_.name == f) match {
          case Nil => throw new IllegalArgumentException(s"unknown frame $f")
          case fs => fs
        }
        case None => FrameSpec.defaults
      }
      val pipe = new IngestPipeline(spark, s"$root/raw", s"$root/agg",
        s"$root/reports", framesSel)
      val n = pipe.reAggregate(symbols, dates, framesSel)
      println(s"[aggregate] frames=${framesSel.map(_.name).mkString(",")} " +
        s"symbols=${if (symbols.isEmpty) "*" else symbols.mkString(",")} " +
        s"rows=$n")

    case "validate" :: root :: Nil =>
      validateAll(session(), root)
    case "validate" :: root :: "--list" :: Nil =>
      CsvReportSink.list(session(), s"$root/reports").foreach(println)
    case "validate" :: root :: "--show" :: jobId :: Nil =>
      printCsv(CsvReportSink.read(session(), s"$root/reports", jobId), Int.MaxValue)

    case "backfill" :: root :: start :: end :: rest =>
      backfill(session(), root, start, end, rest.headOption.map(_.split(",").toSeq))

    case "prune" :: root :: ageExpr :: rest =>
      prune(session(), root, ageExpr, dryRun = rest.contains("--dry-run"))

    case "jobs" :: root :: "list" :: rest =>
      val limit = rest.headOption.map(_.toInt).getOrElse(10)
      new JobRepo(session(), s"$root/state/jobs").load()
        .orderBy(desc("updated_at")).show(limit, truncate = false)
    case "jobs" :: root :: "status" :: Nil =>
      jobsStatus(session(), root)
    case "jobs" :: root :: "cleanup" :: rest =>
      val age = rest.headOption.getOrElse("30d")
      val cutoff = Prune.cutoffDate(age, java.time.LocalDate.now())
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
      val dropped = new JobRepo(session(), s"$root/state/jobs")
        .cleanupTerminal(cutoff)
      println(s"[jobs] cleanup: dropped $dropped terminal jobs older than $age")

    case "symbols" :: root :: "update" :: rest =>
      // symbol-master pipeline (ref: cli/symbols.py update): provider
      // fetch -> identifier validation -> normalize -> SCD-2 merge -> write
      def opt(flag: String): Option[String] =
        rest.dropWhile(_ != flag).drop(1).headOption
      symbolsUpdate(session(), root,
        provider = opt("--provider").getOrElse("fake"),
        asOf = opt("--as-of").getOrElse(java.time.LocalDate.now().toString),
        dryRun = rest.contains("--dry-run"))

    case "symbols" :: root :: Nil =>
      // distinct symbols with bar counts + date range, most data first
      val spark = session()
      try spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
        .groupBy("symbol")
        .agg(count(lit(1)).as("bars"), min("date").as("first_date"),
          max("date").as("last_date"))
        .orderBy(desc("bars"), col("symbol"))
        .show(100, truncate = false)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        println("[symbols] store is empty")
      }

    case "compact" :: root :: rest =>
      val maxFiles = rest.headOption.map(_.toInt).getOrElse(1)
      val n = new graft.storage.ParquetStore(session(), s"$root/raw")
        .compactStore(maxFiles)
      println(s"[compact] rewrote $n crowded partitions (> $maxFiles files)")

    case "files" :: root :: rest =>
      val n = rest.headOption.map(_.toInt).getOrElse(20)
      new graft.storage.ParquetStore(session(), s"$root/raw")
        .listFilesRecent(n)
        .withColumn("size", graft.functions.Humanize.bytes(col("bytes")))
        .show(n, truncate = false)

    case "providers" :: Nil =>
      // ref: cli/utils.py:242-256 — list the registered vendor dialects
      val names = graft.sources.ProviderRegistry.list()
      names.foreach(n => println(s"  - $n"))
      println(s"total: ${names.length} providers")

    case "health" :: root :: Nil =>
      sys.exit(if (health(session(), root)) 0 else 1)

    case "factory-reset" :: root :: rest =>
      factoryReset(session(), root,
        confirm = rest.contains("--confirm"), dryRun = rest.contains("--dry-run"))

    case "metrics" :: root :: "list" :: Nil =>
      new MetricsStore(session(), s"$root/state/metrics").names()
        .collect().foreach(r => println(r.getString(0)))
    case "metrics" :: root :: "summary" :: Nil =>
      new MetricsStore(session(), s"$root/state/metrics").summary()
        .show(100, truncate = false)
    case "metrics" :: root :: "avg" :: name :: rest =>
      val since = rest.headOption.map(_.toLong).getOrElse(0L)
      new MetricsStore(session(), s"$root/state/metrics")
        .windowAvg(name, since).show(truncate = false)
    case "metrics" :: root :: "trend" :: name :: Nil =>
      new MetricsStore(session(), s"$root/state/metrics")
        .trend(name, System.currentTimeMillis() / 1000).show(48, truncate = false)
    case "metrics" :: root :: "export" :: Nil =>
      // Prometheus text exposition (ref metrics_server.py scrape surface)
      print(new MetricsStore(session(), s"$root/state/metrics").prometheusText())
    case "metrics" :: root :: "serve" :: rest =>
      // live Prometheus scrape endpoint (ref metrics_server.py:37-200):
      // GET /metrics serves the text exposition built from the store.
      // Default bind is localhost (safe); pass a host (or set
      // GRAFT_METRICS_HOST=0.0.0.0) so an EXTERNAL Prometheus can scrape.
      val port = rest.headOption.map(_.toInt)
        .orElse(sys.env.get("GRAFT_METRICS_PORT").map(_.toInt))
        .getOrElse(8000)
      val host = rest.drop(1).headOption
        .orElse(sys.env.get("GRAFT_METRICS_HOST"))
        .getOrElse("localhost")
      val srv = new graft.metrics.MetricsServer(
        new MetricsStore(session(), s"$root/state/metrics"), port, host)
      val bound = srv.start()
      println(s"[metrics] serving http://$host:$bound/metrics (ctrl-c to stop)")
      Thread.currentThread().join()
    case "metrics" :: root :: "dashboard" :: Nil =>
      // one-shot dashboard (ref cli/metrics_dashboard.py data surface,
      // minus the live HTML/TUI): per-metric summary then the
      // per-provider/feed rollup
      val ms = new MetricsStore(session(), s"$root/state/metrics")
      println("== metrics summary ==")
      ms.summary().show(100, truncate = false)
      println("== by provider/feed ==")
      ms.dashboard().show(100, truncate = false)

    case "gaps" :: root :: start :: end :: Nil =>
      val spark = session()
      // partition-index path: gap detection never reads parquet footers
      GapDetector.missingDaysInStore(
          new graft.storage.ParquetStore(spark, s"$root/raw"), "1m", start, end)
        .orderBy("symbol", "date").show(100)

    case "stream-demo" :: Nil =>
      // live Structured Streaming path: rate source -> bar mapping ->
      // watermarked tumbling resample -> console, a few micro-batches
      val spark = session()
      import graft.streaming.StreamingIngest
      val bars = spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        .select(
          concat(lit("SYM"), (col("value") % 3).cast("string")).as("symbol"),
          col("timestamp"),
          (col("value") % 100).cast("double").as("open"),
          ((col("value") % 100) + 1).cast("double").as("high"),
          ((col("value") % 100) - 1).cast("double").as("low"),
          (col("value") % 100).cast("double").as("close"),
          lit(10L).as("volume"))
      val q = StreamingIngest.streamingResample(bars, graft.core.FrameSpec("10s", 10),
          watermark = "5 seconds")
        .writeStream.format("console").outputMode("append")
        .option("truncate", "false").start()
      q.awaitTermination(20000)
      q.stop()

    case "demo" :: root :: Nil =>
      val spark = session()
      ingest(spark, root, Seq("AAPL", "MSFT", "TSLA"), "2024-01-02", 390)
      new IngestPipeline(spark, s"$root/raw", s"$root/agg", s"$root/reports")
        .query("SELECT symbol, count(*) AS bars_5m, min(ts_ns) AS first_ts " +
          "FROM bars_5m GROUP BY symbol ORDER BY symbol").show()

    case other =>
      System.err.println(
        s"usage: ingest|query|validate|backfill|prune|jobs|gaps|demo|stream-demo ... (got: $other)")
      sys.exit(2)
  }

  /** One synthetic-source ingestion job with full state tracking: the job
    * transitions to FAILED (and the error is rethrown) when the pipeline
    * throws — the reference's state machine marks failures the same way.
    */
  private[cli] def ingest(spark: SparkSession, root: String,
                          symbols: Seq[String], startDate: String, nBars: Int): Unit = {
    val startNs = java.time.LocalDate.parse(startDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L +
      48600L * 1000000000L // 13:30 UTC market open
    val jobId = s"${symbols.mkString("_")}_$startDate"
    val repo = new JobRepo(spark, s"$root/state/jobs")
    val now = System.currentTimeMillis() / 1000
    repo.save(Seq(Job(jobId, symbols.mkString(","), startDate, JobState.Pending, now, now)))
    repo.transition(jobId, JobState.InProgress, now)
    val pipe = new IngestPipeline(spark, s"$root/raw", s"$root/agg", s"$root/reports")
    val bars = SyntheticSource.bars(spark, symbols, startNs, nBars)
    val (clean, errs) =
      try pipe.runJob(bars, jobId)
      catch {
        case e: Throwable =>
          repo.transition(jobId, JobState.Failed, System.currentTimeMillis() / 1000)
          throw e
      }
    repo.transition(jobId, JobState.Completed, System.currentTimeMillis() / 1000)
    new MetricsStore(spark, s"$root/state/metrics")
      .record(Seq((now, "bars_ingested", clean.toDouble, "synthetic", "fake")))
    println(s"[ingest] job=$jobId clean=$clean errors=$errs frames=" +
      FrameSpec.defaults.map(_.name).mkString(","))
  }

  /** Symbol-master update (ref: cli/symbols.py:116-240 and
    * symbol_pipeline.py): fetch a provider snapshot, null invalid FIGIs
    * (check-digit), build natural keys, dedup, SCD-2 merge into the
    * master dimension at `root/state/symbols_master`, write (unless
    * `--dry-run`, which prints the classify histogram instead).
    */
  private[cli] def symbolsUpdate(spark: SparkSession, root: String,
                                 provider: String, asOf: String,
                                 dryRun: Boolean): Unit = {
    import graft.sources._
    import graft.symbols.{Identifiers, Normalizer, ScdMerge}
    val cfg = ClientConfig(
      baseUrl = sys.env.getOrElse("GRAFT_PROVIDER_URL", "http://fake"),
      apiKey = sys.env.getOrElse("GRAFT_API_KEY", ""))
    val snapshot0 = provider match {
      case "fake" =>
        new SymbolFeedClient(cfg, AuthStrategy.NoAuth,
            new FakeSymbolServer(nSymbols = 120, pageSize = 50))
          .fetchSymbols(spark)
          .select(col("ticker"), col("name").as("company_name"),
            col("mic").as("exchange_mic"), col("figi"))
          .withColumn("status", lit("ACTIVE"))
      case "nasdaq" =>
        new NasdaqSymbolFeed(cfg, new JdkHttpClient,
            asOfOverride = Some(asOf)).fetchSymbols(spark)
          .select(col("ticker"), col("company_name"),
            col("mic").as("exchange_mic"), col("figi"), col("status"))
      case "polygon" =>
        new PolygonSymbolFeed(cfg,
            AuthStrategy.QueryTokenAuth("apikey", cfg.apiKey),
            new JdkHttpClient, asOf = asOf).fetchSymbols(spark)
          .select(col("ticker"), col("company_name"),
            col("mic").as("exchange_mic"), col("figi"), col("status"))
      case other => throw new IllegalArgumentException(
        s"unknown symbol provider $other (have: fake, nasdaq, polygon)")
    }
    // invalid check-digit FIGIs are nulled -> natural key falls back to
    // ticker|mic (columnar validation: one bad row cannot fail the batch)
    val snapshot = Normalizer.dedup(
      Normalizer.withNaturalKey(
          snapshot0.withColumn("figi",
            when(col("figi").isNotNull && Identifiers.figiValid(col("figi")),
              col("figi"))))
        .withColumn("as_of", to_date(lit(asOf)))
        .withColumn("provider", lit(provider)))
      .drop("as_of", "provider")
    val masterPath = s"$root/state/symbols_master"
    val master =
      try spark.read.option("basePath", masterPath).parquet(masterPath)
        .drop("year", "month")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        // first run: empty master with the snapshot schema + SCD columns
        val empty = snapshot.where(lit(false))
        empty
          .withColumn("id", lit(null).cast("long"))
          .withColumn("valid_from", lit(null).cast("date"))
          .withColumn("valid_to", lit(null).cast("date"))
      }
    if (dryRun) {
      ScdMerge.classify(master, snapshot)
        .groupBy("action").agg(count(lit(1)).as("n")).orderBy("action")
        .collect().foreach(r => println(s"  ${r.getString(0)}: ${r.getLong(1)}"))
      println(s"[symbols] dry-run: no writes (provider=$provider as-of=$asOf)")
    } else {
      val merged = ScdMerge.merge(master, snapshot, asOf)
      ScdMerge.write(spark, merged, masterPath)
      val n = spark.read.option("basePath", masterPath).parquet(masterPath).count()
      println(s"[symbols] updated master: $n versions (provider=$provider as-of=$asOf)")
    }
  }

  /** Provider-driven ingestion: resolve the vendor dialect from the
    * registry, drain its paged feed per symbol through the rate-limited
    * retrying client, then run the normal pipeline job with job-state
    * tracking (ref: cli/ohlcv_ingest.py provider path).
    */
  private[cli] def ingestVia(spark: SparkSession, root: String, provider: String,
                             symbols: Seq[String], startDate: String, nBars: Int): Unit = {
    import graft.sources._
    val factory = ProviderRegistry.get(provider).getOrElse(
      throw new IllegalArgumentException(
        s"unknown provider $provider (have: ${ProviderRegistry.list().mkString(",")})"))
    val cfg = ClientConfig(
      baseUrl = sys.env.getOrElse("GRAFT_PROVIDER_URL", "http://fake"),
      apiKey = sys.env.getOrElse("GRAFT_API_KEY", ""))
    val auth: AuthStrategy =
      if (cfg.apiKey.isEmpty) AuthStrategy.NoAuth
      else AuthStrategy.QueryTokenAuth("token", cfg.apiKey)
    val client = factory(cfg, auth, new JdkHttpClient)
    val startNs = java.time.LocalDate.parse(startDate)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L +
      48600L * 1000000000L
    val endNs = startNs + nBars.toLong * 60000000000L
    val bars = symbols.map(sym =>
        PagedProviderSource.ingest(spark, client, sym, startNs, endNs))
      .reduce(_ unionByName _)
    val jobId = s"${symbols.mkString("_")}_${startDate}_$provider"
    val repo = new JobRepo(spark, s"$root/state/jobs")
    val now = System.currentTimeMillis() / 1000
    repo.save(Seq(Job(jobId, symbols.mkString(","), startDate, JobState.Pending, now, now)))
    repo.transition(jobId, JobState.InProgress, now)
    val pipe = new IngestPipeline(spark, s"$root/raw", s"$root/agg", s"$root/reports")
    val (clean, errs) =
      try pipe.runJob(bars, jobId)
      catch {
        case e: Throwable =>
          repo.transition(jobId, JobState.Failed, System.currentTimeMillis() / 1000)
          throw e
      }
    repo.transition(jobId, JobState.Completed, System.currentTimeMillis() / 1000)
    println(s"[ingest] provider=$provider job=$jobId clean=$clean errors=$errs")
  }

  /** Re-validate everything in the raw store, write a CSV report, print
    * per-reason counts (ref: ohlcv_validate.py validate-and-report flow).
    */
  private[cli] def validateAll(spark: SparkSession, root: String): Unit = {
    val bars = spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
      .select("symbol", "ts_ns", "open", "high", "low", "close", "volume")
    val (_, errors) = RuleSet.split(bars)
    val jobId = "revalidate"
    val n = errors.count()
    CsvReportSink.write(errors, s"$root/reports", jobId)
    println(s"[validate] checked=${bars.count()} errors=$n report=$root/reports/$jobId")
    errors.groupBy("reason").agg(count(lit(1)).as("n")).orderBy("reason")
      .collect().foreach(r => println(s"  ${r.getString(0)}: ${r.getLong(1)}"))
  }

  /** Executing backfill loop (T6; ref ohlcv_backfill.py:113-161): detect
    * per-symbol missing days, run one ingestion job per gap through the
    * pipeline, record job state + metrics per gap, never abort the loop on
    * a single-gap failure.
    */
  private[cli] def backfill(spark: SparkSession, root: String,
                            start: String, end: String,
                            symbolsOpt: Option[Seq[String]]): Unit = {
    val s2 = spark; import s2.implicits._
    // existing set from the partition directory index — no data/footer reads
    val existing = new graft.storage.ParquetStore(spark, s"$root/raw")
      .partitionDays("1m")
    // a sentinel 1970 row per requested symbol keeps symbols with no data
    // at all in the gap scan (their whole range is missing)
    val seeded = symbolsOpt match {
      case Some(ss) =>
        existing.where(col("symbol").isin(ss: _*))
          .unionByName(ss.toDF("symbol")
            .withColumn("date", to_date(lit("1970-01-01"))))
      case None => existing
    }
    val plan = GapDetector.backfillPlan(
      GapDetector.missingDays(seeded, start, end)).collect()
    val metrics = new MetricsStore(spark, s"$root/state/metrics")
    var ok = 0L; var failed = 0L
    plan.foreach { r =>
      val sym = r.getAs[String]("symbol")
      val day = r.getAs[java.sql.Date]("date").toString
      val t0 = System.nanoTime()
      try {
        ingest(spark, root, Seq(sym), day, 390)
        ok += 1
        metrics.record(Seq((System.currentTimeMillis() / 1000,
          "backfill_gap_seconds", (System.nanoTime() - t0) / 1e9, sym, "backfill")))
      } catch {
        case e: Throwable =>
          failed += 1
          metrics.record(Seq((System.currentTimeMillis() / 1000,
            "backfill_gap_failed", 1.0, sym, "backfill")))
          System.err.println(s"[backfill] FAILED $sym $day: ${e.getMessage}")
      }
    }
    println(s"[backfill] gaps=${plan.length} ok=$ok failed=$failed")
  }

  /** Retention prune: partition directories older than the cutoff plus the
    * metadata half (terminal job rows) — ref prune.py:41-330.
    */
  private[cli] def prune(spark: SparkSession, root: String,
                         ageExpr: String, dryRun: Boolean): Unit = {
    val cutoff = Prune.cutoffDate(ageExpr, java.time.LocalDate.now())
    val store = spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
      .withColumn("frame", lit("1m"))
    val parts = Prune.prunablePartitions(store, cutoff)
      .collect().map(r => (r.getAs[String]("frame"), r.getAs[String]("symbol"),
        r.getAs[java.sql.Date]("date").toString)).toSeq
    if (dryRun) {
      println(s"[prune] DRY RUN: would delete ${parts.length} partitions before $cutoff")
      parts.take(20).foreach(p => println(s"  frame=${p._1}/symbol=${p._2}/date=${p._3}"))
    } else {
      val deleted = Prune.prunePaths(spark, s"$root/raw", parts)
      val droppedJobs = new JobRepo(spark, s"$root/state/jobs")
        .pruneByDay(cutoff.toString)
      println(s"[prune] deleted=$deleted partitions, dropped=$droppedJobs job rows before $cutoff")
    }
  }

  private[cli] def jobsStatus(spark: SparkSession, root: String): Unit = {
    val repo = new JobRepo(spark, s"$root/state/jobs")
    println("Job Status Summary")
    repo.histogram().collect().foreach(r =>
      println(f"  ${r.getString(0)}%-12s: ${r.getLong(1)}%6d"))
    println("Recently active:")
    repo.load()
      .where(col("state").isin(JobState.Pending, JobState.InProgress))
      .orderBy(desc("updated_at")).limit(10)
      .collect().foreach(r => println(s"  ${r.getAs[String]("job_id")} " +
        s"${r.getAs[String]("state")} updated=${r.getAs[Long]("updated_at")}"))
  }

  /** Installation health check (ref: cli/health_check.py:53-98): session,
    * registry, fake provider fetch, data-dir writability, store/view
    * readability, metrics store, and a mini end-to-end pipeline. Prints
    * one PASS/FAIL line per check, returns overall status.
    */
  private[cli] def health(spark: SparkSession, root: String): Boolean = {
    import graft.sources._
    var ok = true
    def check(name: String)(f: => Unit): Unit = {
      val r = try { f; "PASS" } catch { case e: Throwable => ok = false; s"FAIL ${e.getMessage.take(80)}" }
      println(f"[health] $name%-28s $r")
    }
    check("spark_session")(require(spark.version.nonEmpty))
    check("provider_registry")(require(ProviderRegistry.list().nonEmpty))
    check("fake_provider_fetch") {
      val c = ProviderRegistry.get("fake").get(
        ClientConfig("http://fake"), AuthStrategy.NoAuth, new FakeBarServer(1, 1))
      require(c.fetchBatch("HLT", 0L, 60000000000L).nonEmpty)
    }
    // per-dialect connectivity probes (ref cli/health_check.py
    // check_provider_registry/check_fake_provider, widened to every
    // registered dialect): each provider is CONSTRUCTED through the
    // registry and drains one small batch from its canned in-process
    // wire server — auth plumbing, pagination, parsing and field maps
    // all execute, zero egress. Dialects registered at runtime without
    // a canned fixture are reported, not failed: absence of a test seam
    // is not ill health.
    locally {
      val base = VendorFakeBars.BaseEpochSec
      val tokenAuth = AuthStrategy.QueryTokenAuth("token", "health-probe")
      val canned: Map[String, (HttpClient, AuthStrategy, Long, Long)] = Map(
        "barfeed" -> ((new FakeBarServer(nBars = 5, pageSize = 5),
          tokenAuth, 0L, 5L * 60000000000L)),
        "fake" -> ((new FakeBarServer(nBars = 5, pageSize = 5),
          tokenAuth, 0L, 5L * 60000000000L)),
        "iex" -> ((new FakeIexServer(nBars = 5), tokenAuth,
          base * 1000000000L, (base + 300L) * 1000000000L)),
        "finnhub" -> ((new FakeFinnhubServer(nBars = 5), tokenAuth,
          base * 1000000000L, (base + 300L) * 1000000000L)),
        "polygon" -> ((new FakePolygonServer(nBars = 5, pageSize = 5),
          AuthStrategy.QueryTokenAuth("apikey", "health-probe"),
          base * 1000000000L, (base + 300L) * 1000000000L)))
      ProviderRegistry.list().foreach { name =>
        canned.get(name) match {
          case Some((server, auth, startNs, endNs)) =>
            check(s"provider:$name") {
              val client = ProviderRegistry.get(name).get(
                ClientConfig("http://fake"), auth, server)
              val bars = client.fetchBatch("HLT", startNs, endNs)
              require(bars.nonEmpty, s"dialect $name returned no bars")
            }
          case None =>
            println(f"[health] provider:$name%-19s SKIP (no canned wire fixture)")
        }
      }
    }
    check("config_parse") {
      val cfg = graft.config.IngestConfig.loadString(
        """|symbols: [HLT]
           |start: 2024-01-02
           |end: 2024-01-03
           |provider: fake
           |""".stripMargin)
      require(cfg.symbols.nonEmpty)
    }
    check("job_state_store") {
      val repo = new graft.jobs.JobRepo(spark, s"$root/state/jobs")
      repo.load().limit(1).collect(); repo.histogram().collect()
    }
    check("checkpoint_store") {
      new graft.jobs.Checkpoints(spark, s"$root/state/checkpoints")
        .load().limit(1).collect()
    }
    check("data_dir_writable") {
      val p = new org.apache.hadoop.fs.Path(s"$root/.health_probe")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val o = fs.create(p, true); o.write(1); o.close(); fs.delete(p, false)
    }
    check("raw_store_readable") {
      try spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw").limit(1).collect()
      catch { case _: org.apache.spark.sql.AnalysisException => () } // empty is healthy
    }
    check("views_queryable") {
      new IngestPipeline(spark, s"$root/raw", s"$root/agg", s"$root/reports")
        .query("SELECT count(*) FROM bars_5m").collect()
    }
    check("metrics_store")(new MetricsStore(spark, s"$root/state/metrics").names().collect())
    check("end_to_end_pipeline") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_health").toString
      val pipe = new IngestPipeline(spark, s"$tmp/raw", s"$tmp/agg", s"$tmp/rep")
      val bars = SyntheticSource.bars(spark, Seq("HLT"),
        1704202200000000000L, 10)
      val (clean, _) = pipe.runJob(bars, "health")
      require(clean == 10L)
    }
    println(s"[health] overall: ${if (ok) "HEALTHY" else "UNHEALTHY"}")
    ok
  }

  /** Nuclear data wipe (ref: cli/factory_reset.py:64-135): lists raw/agg/
    * reports/state with sizes; deletes only with --confirm.
    */
  private[cli] def factoryReset(spark: SparkSession, root: String,
                                confirm: Boolean, dryRun: Boolean): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val targets = Seq("raw", "agg", "reports", "state").map(d =>
      new org.apache.hadoop.fs.Path(s"$root/$d"))
    val existing = targets.filter(p => p.getFileSystem(conf).exists(p))
    if (existing.isEmpty) { println("[factory-reset] nothing to remove"); return }
    existing.foreach { p =>
      val fs = p.getFileSystem(conf)
      val bytes = fs.getContentSummary(p).getLength
      println(f"[factory-reset] $p%-60s ${bytes}%12d bytes")
    }
    if (dryRun || !confirm) {
      println("[factory-reset] DRY RUN (pass --confirm to delete)")
    } else {
      existing.foreach(p => p.getFileSystem(conf).delete(p, true))
      println(s"[factory-reset] removed ${existing.length} trees")
    }
  }

  private def csvEsc(s: String): String =
    if (s == null) ""
    else if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def csvLine(row: org.apache.spark.sql.Row): String =
    (0 until row.length).map(i =>
      csvEsc(if (row.isNullAt(i)) null else row.get(i).toString)).mkString(",")

  /** CSV rendering with header (ref: query.py --csv), as a string — the
    * S10 golden test's byte-exact surface. Only for bounded output:
    * [[printCsv]] keeps the streaming path because `validate --show`
    * passes limit = Int.MaxValue (a report can dwarf driver memory).
    */
  private[cli] def renderCsv(df: DataFrame, limit: Int): String = {
    val sb = new StringBuilder
    sb.append(df.columns.map(csvEsc).mkString(",")).append('\n')
    df.limit(limit).toLocalIterator().forEachRemaining(row =>
      sb.append(csvLine(row)).append('\n'))
    sb.result()
  }

  /** CSV to stdout with header, one row at a time — constant driver
    * memory at any limit (ref: query.py --csv).
    */
  private[cli] def printCsv(df: DataFrame, limit: Int): Unit = {
    println(df.columns.map(csvEsc).mkString(","))
    df.limit(limit).toLocalIterator().forEachRemaining(row =>
      println(csvLine(row)))
  }

  /** Markdown table rendering (ref: query.py to_markdown fallback; F13). */
  private[cli] def renderMarkdown(df: DataFrame, limit: Int): String = {
    val rows = df.limit(limit).collect()
    val cols = df.columns.toSeq
    val cells = rows.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "" else r.get(i).toString))
    val widths = cols.indices.map(i =>
      (cols(i).length +: cells.map(_(i).length)).max)
    def line(vals: Seq[String]): String =
      vals.zipWithIndex.map { case (v, i) => v.padTo(widths(i), ' ') }
        .mkString("| ", " | ", " |")
    val sb = new StringBuilder
    sb.append(line(cols)).append('\n')
    sb.append(widths.map("-" * _).mkString("| ", " | ", " |")).append('\n')
    cells.foreach(c => sb.append(line(c)).append('\n'))
    sb.result()
  }

  /** Markdown table to stdout (ref: query.py to_markdown fallback; F13). */
  private[cli] def printMarkdown(df: DataFrame, limit: Int): Unit =
    print(renderMarkdown(df, limit))
}
