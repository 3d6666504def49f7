package graft.cli

import graft.SparkSpec
import graft.jobs.{JobRepo, JobState}
import graft.validate.CsvReportSink
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** CLI command e2e over a temp data root: ingest with job tracking,
  * re-validate, executing backfill, retention prune (partitions + job
  * metadata), jobs status/cleanup, csv/markdown output.
  */
class CliSpec extends SparkSpec {

  private def newRoot(): String =
    Files.createTempDirectory("graft_cli").toString

  test("ingest -> jobs status -> validate -> query output modes") {
    val root = newRoot()
    Main.ingest(spark, root, Seq("AAPL", "MSFT"), "2024-01-02", 30)
    val repo = new JobRepo(spark, s"$root/state/jobs")
    val jobs = repo.load().collect()
    assert(jobs.length == 1)
    assert(jobs.head.getAs[String]("state") == JobState.Completed)

    Main.validateAll(spark, root)
    assert(CsvReportSink.list(spark, s"$root/reports").nonEmpty)
    // synthetic bars are clean: the revalidate report must still exist
    // (header-only parity) and read back with the error schema
    val report = CsvReportSink.read(spark, s"$root/reports", "revalidate")
    assert(report.columns.toSeq == Seq("symbol", "ts_ns", "reason"))
    assert(report.count() == 0L)

    Main.jobsStatus(spark, root) // smoke: prints summary
    val df = spark.sql("SELECT 1 AS a, 'x,y' AS b")
    Main.printCsv(df, 10)
    Main.printMarkdown(df, 10)

    // metrics surface: ingest recorded bars_ingested
    val ms = new graft.metrics.MetricsStore(spark, s"$root/state/metrics")
    assert(ms.names().collect().map(_.getString(0)).contains("bars_ingested"))
    val sum = ms.summary().collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(sum("bars_ingested").getAs[Long]("n") == 1L)
    assert(sum("bars_ingested").getAs[Double]("latest_value") == 60.0) // 30 bars x 2 symbols
  }

  test("aggregate rebuilds frames from the raw store without re-ingesting") {
    val root = newRoot()
    Main.ingest(spark, root, Seq("NVDA"), "2024-01-02", 60)
    val before = spark.read.option("basePath", s"$root/agg").parquet(s"$root/agg")
      .groupBy("frame").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // wipe the aggregate store: the standalone command must rebuild it
    // from raw alone (no new ingestion job, job log untouched)
    def rmrf(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmrf)
      java.nio.file.Files.deleteIfExists(p)
    }
    rmrf(java.nio.file.Paths.get(s"$root/agg"))
    val jobsBefore = new JobRepo(spark, s"$root/state/jobs").load().count()
    Main.main(Array("aggregate", root))
    val after = spark.read.option("basePath", s"$root/agg").parquet(s"$root/agg")
      .groupBy("frame").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
    assert(new JobRepo(spark, s"$root/state/jobs").load().count() == jobsBefore)
    // frame-scoped re-run is idempotent (dynamic overwrite, same counts)
    Main.main(Array("aggregate", root, "--frame", "5m"))
    val after5m = spark.read.option("basePath", s"$root/agg").parquet(s"$root/agg")
      .where("frame = '5m'").count()
    assert(after5m == before("5m"))
    // job-scoped form parses SYMBOL_DATE and prunes to that day
    Main.main(Array("aggregate", root, "--job", "NVDA_2024-01-02"))
    assert(spark.read.option("basePath", s"$root/agg").parquet(s"$root/agg")
      .groupBy("frame").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == before)
    // provider-suffixed ids (SYMS_DATE_provider, the ingestVia shape) find
    // the date by pattern — the provider name must NOT be taken as the date
    Main.main(Array("aggregate", root, "--job", "NVDA_2024-01-02_fake"))
    assert(spark.read.option("basePath", s"$root/agg").parquet(s"$root/agg")
      .groupBy("frame").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == before)
    // and a dateless id fails loudly instead of aggregating zero partitions
    intercept[IllegalArgumentException](
      Main.main(Array("aggregate", root, "--job", "NVDA")))
    // dashboard one-shot prints both rollups (smoke)
    Main.main(Array("metrics", root, "dashboard"))
    val dash = new graft.metrics.MetricsStore(spark, s"$root/state/metrics")
      .dashboard().collect().map(r => r.getAs[String]("name")).toSet
    assert(dash.contains("bars_ingested"))
  }

  test("S10: --csv and --md rendering match the golden files byte-exact") {
    val df = spark.sql(
      "SELECT * FROM VALUES (1, 'x,y', 1.5), (2, 'q\"t', CAST(NULL AS DOUBLE)), " +
        "(3, 'plain', 2.0) AS t(a, b, c) ORDER BY a")
    def golden(name: String): String = {
      val in = getClass.getResourceAsStream(s"/golden/$name")
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    assert(Main.renderCsv(df, 10) == golden("query.csv"))
    assert(Main.renderMarkdown(df, 10) == golden("query.md"))
  }

  test("symbols update runs the SCD pipeline; re-run is a no-op; dry-run writes nothing") {
    val root = newRoot()
    val masterPath = s"$root/state/symbols_master"
    Main.symbolsUpdate(spark, root, "fake", "2024-06-01", dryRun = false)
    val m1 = spark.read.option("basePath", masterPath).parquet(masterPath)
    assert(m1.count() == 120L) // every fake symbol inserted once
    // corrupt-check-digit FIGIs (every 7th) were nulled -> ticker|mic keys
    assert(m1.where(col("figi").isNull).count() ==
      (0 until 120).count(_ % 7 == 0))
    assert(m1.where(col("valid_to").isNull).count() == 120L)
    // identical snapshot re-merge: unchanged everywhere, same version count
    Main.symbolsUpdate(spark, root, "fake", "2024-06-02", dryRun = false)
    val m2 = spark.read.option("basePath", masterPath).parquet(masterPath)
    assert(m2.count() == 120L)
    // dry-run only prints the histogram
    Main.symbolsUpdate(spark, root, "fake", "2024-06-03", dryRun = true)
    assert(spark.read.option("basePath", masterPath).parquet(masterPath)
      .count() == 120L)
    intercept[IllegalArgumentException](
      Main.symbolsUpdate(spark, root, "bogus", "2024-06-01", dryRun = true))
  }

  test("provider-driven ingest resolves the registry and tracks the job") {
    val root = newRoot()
    // "fake" wraps the in-process wire server: 390 deterministic bars/symbol
    Main.ingestVia(spark, root, "fake", Seq("AAPL"), "2024-01-02", 390)
    val jobs = new JobRepo(spark, s"$root/state/jobs").load().collect()
      .map(r => r.getAs[String]("job_id") -> r.getAs[String]("state")).toMap
    assert(jobs("AAPL_2024-01-02_fake") == JobState.Completed)
    val raw = spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
    assert(raw.where("symbol = 'AAPL'").count() == 390L)
    Main.main(Array("providers")) // smoke: lists registered dialects
    assert(graft.sources.ProviderRegistry.list()
      .toSet.intersect(Set("iex", "finnhub", "polygon", "fake", "barfeed")).size == 5)
    intercept[IllegalArgumentException](
      Main.ingestVia(spark, root, "nope", Seq("A"), "2024-01-02", 1))
  }

  test("backfill executes per-gap jobs and records their state") {
    val root = newRoot()
    // day 1 ingested, day 2 missing -> exactly one gap to fill
    Main.ingest(spark, root, Seq("TSLA"), "2024-01-02", 30)
    Main.backfill(spark, root, "2024-01-02", "2024-01-03", Some(Seq("TSLA")))
    val jobs = new JobRepo(spark, s"$root/state/jobs").load().collect()
      .map(r => r.getAs[String]("job_id") -> r.getAs[String]("state")).toMap
    assert(jobs("TSLA_2024-01-02") == JobState.Completed)
    assert(jobs("TSLA_2024-01-03") == JobState.Completed)
    // the gap day's partitions now exist
    val filled = spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
      .where("date = '2024-01-03'")
    assert(filled.count() > 0)
  }

  test("prune removes old partitions and terminal job metadata") {
    val root = newRoot()
    Main.ingest(spark, root, Seq("NVDA"), "2024-01-02", 30)
    Main.prune(spark, root, ageExpr = "1d", dryRun = true)
    assert(spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw").count() > 0)
    val prunedPath = new org.apache.hadoop.fs.Path(
      s"$root/raw/frame=1m/symbol=NVDA/date=2024-01-02")
    val fs = prunedPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(prunedPath), "partition must exist before the real prune")
    Main.prune(spark, root, ageExpr = "1d", dryRun = false)
    // 2024-01-02 is long before today-1d: the partition directory is gone
    assert(!fs.exists(prunedPath))
    // job metadata half: terminal job rows older than cutoff dropped
    assert(new JobRepo(spark, s"$root/state/jobs").load().count() == 0L)
  }

  test("health check passes on a working install; factory-reset wipes") {
    val root = newRoot()
    Main.ingest(spark, root, Seq("INTC"), "2024-01-02", 10)
    assert(Main.health(spark, root), "all health checks should pass")
    // recent-first file listing (O5)
    val files = new graft.storage.ParquetStore(spark, s"$root/raw").listFilesRecent(5)
    assert(files.count() > 0)
    assert(files.columns.toSeq == Seq("path", "bytes", "mod_time"))
    Main.factoryReset(spark, root, confirm = false, dryRun = true)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/raw")), "dry run keeps data")
    Main.factoryReset(spark, root, confirm = true, dryRun = false)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/raw")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/state")))
  }

  test("health matrix: broken raw store, broken provider dialect, fixture-less dialect") {
    import graft.sources._
    val root = newRoot()
    Main.ingest(spark, root, Seq("INTC"), "2024-01-02", 10)
    assert(Main.health(spark, root), "baseline install must be healthy")

    // a dialect with no canned wire fixture is reported SKIP, never FAIL:
    // absence of a test seam is not ill health
    ProviderRegistry.register("customx",
      (cfg, auth, http) => new BarFeedClient(cfg, auth, http))
    assert(Main.health(spark, root),
      "a fixture-less registered dialect must not fail health")

    // a provider whose registered factory breaks fails its probe -> UNHEALTHY
    ProviderRegistry.register("iex", (_, _, _) =>
      throw new RuntimeException("simulated dialect breakage"))
    try
      assert(!Main.health(spark, root), "broken provider dialect must fail health")
    finally // restore the real dialect for the rest of the suite
      ProviderRegistry.register("iex", (cfg, auth, http) => new IexBarFeed(cfg, auth, http))
    assert(Main.health(spark, root), "restored registry must be healthy again")

    // corrupt raw store: a store whose only file is unreadable parquet
    // fails raw_store_readable (a corrupt file BESIDE healthy ones can
    // escape the limit(1) sample — store-wide scans are the validate
    // command's job, not a liveness probe's)
    val root2 = newRoot()
    Main.ingest(spark, root2, Seq("INTC"), "2024-01-02", 10)
    val fs = new org.apache.hadoop.fs.Path(root2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root2/raw"), true)
    val junk = new org.apache.hadoop.fs.Path(s"$root2/raw/junk.parquet")
    val o = fs.create(junk, true)
    o.write("this is not parquet".getBytes); o.close()
    assert(!Main.health(spark, root2), "corrupt raw store must fail health")
  }

  test("jobs cleanup compacts the append log") {
    val root = newRoot()
    Main.ingest(spark, root, Seq("AMD"), "2024-01-02", 30)
    val repo = new JobRepo(spark, s"$root/state/jobs")
    assert(repo.load().count() == 1L)
    val dropped = repo.cleanupTerminal(System.currentTimeMillis() / 1000 + 10)
    assert(dropped == 1L)
    assert(repo.load().count() == 0L)
  }
}
