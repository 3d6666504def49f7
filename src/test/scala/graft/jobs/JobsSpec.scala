package graft.jobs

import graft.SparkSpec
import java.time.LocalDate
import org.apache.spark.sql.functions._

class JobsSpec extends SparkSpec {

  test("job state machine enforces legal transitions") {
    assert(JobState.canTransition(JobState.Pending, JobState.InProgress))
    assert(JobState.canTransition(JobState.InProgress, JobState.Completed))
    assert(!JobState.canTransition(JobState.Completed, JobState.InProgress))
    assert(!JobState.canTransition(JobState.Pending, JobState.Completed))
  }

  test("job repo persists and transitions") {
    val repo = new JobRepo(spark, tmpDir("jobs") + "/jobs")
    repo.save(Seq(
      Job("j1", "AAPL", "2024-01-02", JobState.Pending, 100L, 100L),
      Job("j2", "MSFT", "2024-01-02", JobState.Pending, 100L, 100L)))
    repo.transition("j1", JobState.InProgress, 200L)
    val states = repo.load().collect()
      .map(r => r.getAs[String]("job_id") -> r.getAs[String]("state")).toMap
    assert(states == Map("j1" -> JobState.InProgress, "j2" -> JobState.Pending))
    intercept[Exception](repo.transition("j1", JobState.Pending, 300L))
    assert(repo.histogram().count() == 2)
  }

  test("checkpoints: resume from checkpoint+1bar inside window, else job start") {
    val s = spark; import s.implicits._
    val cp = new Checkpoints(spark, tmpDir("cp") + "/cp")
    val bar = 60000000000L
    cp.save(Seq(("AAPL", 1000L * bar)).toDF("symbol", "last_ts_ns"))
    assert(cp.resumeFrom("AAPL", 900L * bar, 2000L * bar) == 1001L * bar)
    assert(cp.resumeFrom("AAPL", 1500L * bar, 2000L * bar) == 1500L * bar) // stale
    assert(cp.resumeFrom("MSFT", 900L * bar, 2000L * bar) == 900L * bar)  // none
  }

  test("gap detector finds exactly the missing days") {
    val s = spark; import s.implicits._
    val bars = Seq(
      ("AAPL", "2024-01-01"), ("AAPL", "2024-01-03"),
      ("MSFT", "2024-01-01"), ("MSFT", "2024-01-02"), ("MSFT", "2024-01-03")
    ).toDF("symbol", "date").withColumn("date", to_date(col("date")))
    val gaps = GapDetector.missingDays(bars, "2024-01-01", "2024-01-03")
      .collect().map(r => (r.getAs[String]("symbol"), r.getAs[java.sql.Date]("date").toString))
    assert(gaps.toSet == Set(("AAPL", "2024-01-02")))
    val plan = GapDetector.backfillPlan(
      GapDetector.missingDays(bars, "2024-01-01", "2024-01-03")).first()
    assert(plan.getAs[java.sql.Date]("job_end").toString == "2024-01-03")
  }

  test("append log auto-compacts past the file threshold; states survive") {
    val dir = tmpDir("jobsac") + "/jobs"
    val repo = new JobRepo(spark, dir, autoCompactFiles = 5)
    def files(): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    (1 to 4).foreach { i =>
      repo.save(Seq(Job(s"j$i", "AAPL", "2024-01-02", JobState.Pending, i, i)))
    }
    assert(files() == 4) // under threshold: no compaction yet
    (1 to 4).foreach(i => repo.transition(s"j$i", JobState.InProgress, 100L + i))
    // 8 appends crossed the threshold of 5 -> log folded back to one file
    assert(files() <= 5)
    val states = repo.load().collect()
      .map(r => r.getAs[String]("job_id") -> r.getAs[String]("state")).toMap
    assert(states == (1 to 4).map(i => s"j$i" -> JobState.InProgress).toMap)
    assert(repo.get("j3").map(_.state).contains(JobState.InProgress))
  }

  test("compact preserves original seqs — the snapshot cannot shadow a racer") {
    import org.apache.spark.sql.functions.{col, max}
    val dir = tmpDir("jobsseq") + "/jobs"
    val repo = new JobRepo(spark, dir, autoCompactFiles = 0)
    repo.save(Seq(Job("a", "S", "2024-01-02", JobState.Pending, 1L, 1L)))
    repo.transition("a", JobState.InProgress, 2L)
    val maxSeqBefore = spark.read.parquet(dir).agg(max("seq")).first().getLong(0)
    repo.compact()
    // the folded log carries the ORIGINAL newest seq, not a fresh one: an
    // append whose seq was drawn during the compact window therefore
    // always outranks the snapshot copy of its job in latest-wins folding
    val snap = spark.read.parquet(dir).select("seq", "state").collect()
    assert(snap.length == 1)
    assert(snap.head.getLong(0) == maxSeqBefore,
      s"snapshot re-stamped seq: ${snap.head.getLong(0)} != $maxSeqBefore")
    assert(repo.get("a").map(_.state).contains(JobState.InProgress))
    // and a post-compact transition still wins normally
    repo.transition("a", JobState.Completed, 3L)
    assert(repo.get("a").map(_.state).contains(JobState.Completed))
    assert(spark.read.parquet(dir).where(col("seq") > maxSeqBefore).count() == 1L)
  }

  test("point lookup pushes the job_id filter below the latest-wins fold") {
    val dir = tmpDir("jobspl") + "/jobs"
    val repo = new JobRepo(spark, dir)
    repo.save(Seq(Job("jx", "AAPL", "2024-01-02", JobState.Pending, 1L, 1L)))
    repo.save(Seq(Job("jy", "MSFT", "2024-01-02", JobState.Pending, 2L, 2L)))
    assert(repo.get("jy").map(_.symbol).contains("MSFT"))
    // the filtered raw scan must show the pushed job_id predicate
    val scan = spark.read.parquet(dir).where(col("job_id") === "jy")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("job_id"))
  }

  test("store-backed gap detection uses the partition index, not a scan") {
    val s = spark; import s.implicits._
    val root = tmpDir("gapstore") + "/raw"
    val store = new graft.storage.ParquetStore(spark, root)
    val barsFor = (sym: String, day: String) => {
      val ns = java.time.LocalDate.parse(day)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L
      Seq((sym, ns, 1.0, 2.0, 0.5, 1.5, 10L))
        .toDF("symbol", "ts_ns", "open", "high", "low", "close", "volume")
    }
    store.write(barsFor("AAPL", "2024-01-01"), graft.core.FrameSpec.F1m)
    store.write(barsFor("AAPL", "2024-01-03"), graft.core.FrameSpec.F1m)
    store.write(barsFor("MSFT", "2024-01-02"), graft.core.FrameSpec.F1m)
    val gaps = GapDetector.missingDaysInStore(store, "1m", "2024-01-01", "2024-01-03")
    // the whole gap query is built from the directory listing: no parquet
    // scan node anywhere in its plan
    val plan = gaps.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("parquet"))
    val got = gaps.collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[java.sql.Date]("date").toString)).toSet
    assert(got == Set(
      ("AAPL", "2024-01-02"),
      ("MSFT", "2024-01-01"), ("MSFT", "2024-01-03")))
  }

  test("prune: age parse + partition selection") {
    val today = LocalDate.parse("2024-06-15")
    assert(Prune.cutoffDate("30d", today) == LocalDate.parse("2024-05-16"))
    assert(Prune.cutoffDate("18m", today) == LocalDate.parse("2022-12-15"))
    assert(Prune.cutoffDate("5y", today) == LocalDate.parse("2019-06-15"))
    intercept[IllegalArgumentException](Prune.cutoffDate("x5", today))

    val s = spark; import s.implicits._
    val store = Seq(
      ("1m", "AAPL", "2024-01-01"), ("1m", "AAPL", "2024-06-01")
    ).toDF("frame", "symbol", "date").withColumn("date", to_date(col("date")))
    val prunable = Prune.prunablePartitions(store, LocalDate.parse("2024-03-01"))
      .collect().map(_.getAs[java.sql.Date]("date").toString)
    assert(prunable.toSeq == Seq("2024-01-01"))
  }

  test("prometheus export renders latest values with type headers and labels") {
    val ms = new graft.metrics.MetricsStore(spark, tmpDir("prom") + "/m")
    ms.record(Seq(
      (100L, "ingest_rate", 10.0, "alpha", "bars"),
      (200L, "ingest_rate", 20.0, "alpha", "bars"), // latest wins
      (150L, "err.count", 3.0, "beta", "bars")))    // name sanitized
    val text = ms.prometheusText()
    assert(text.contains("# TYPE graft_ingest_rate gauge"))
    assert(text.contains(
      """graft_ingest_rate{provider="alpha",feed="bars"} 20.0 200000"""))
    assert(text.contains("# TYPE graft_err_count gauge"))
    assert(text.contains(
      """graft_err_count{provider="beta",feed="bars"} 3.0 150000"""))
  }

  test("metrics store: windowed avg and bucketed trend") {
    val ms = new graft.metrics.MetricsStore(spark, tmpDir("metrics") + "/m")
    val now = 1000000L
    ms.record(Seq(
      (now - 100, "ingest_rate", 10.0, "fake", "iex"),
      (now - 50, "ingest_rate", 20.0, "fake", "iex"),
      (now - 90000, "ingest_rate", 99.0, "fake", "iex"))) // outside 24h
    val avg = ms.windowAvg("ingest_rate", now - 3600)
    assert(avg.first().getAs[Double]("avg_value") == 15.0)
    val trend = ms.trend("ingest_rate", now, buckets = 24)
    assert(trend.agg(sum("n")).first().getLong(0) == 2L)
    assert(ms.names().count() == 1)
  }
}
