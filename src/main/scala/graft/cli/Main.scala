package graft.cli

import graft.core.FrameSpec
import graft.gen.SyntheticSource
import graft.jobs.{GapDetector, Job, JobRepo, JobState}
import graft.metrics.MetricsStore
import graft.pipeline.IngestPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Thin CLI mirroring the reference's command surface
  * (ref: src/marketpipe/cli/ — ingest-ohlcv / aggregate / query / gaps):
  *
  *   ingest <dataRoot> <symbols,csv> <startIsoDate> <nBars>
  *   query  <dataRoot> <sql> [limit]
  *   gaps   <dataRoot> <start> <end>
  *   demo   <dataRoot>
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
    case "query" :: root :: sql :: rest =>
      val spark = session()
      val limit = rest.headOption.map(_.toInt).getOrElse(50)
      new IngestPipeline(spark, s"$root/raw", s"$root/agg", s"$root/reports")
        .query(sql).show(limit, truncate = false)
    case "gaps" :: root :: start :: end :: Nil =>
      val spark = session()
      val bars = spark.read.option("basePath", s"$root/raw").parquet(s"$root/raw")
      GapDetector.missingDays(bars.select(col("symbol"), col("date")), start, end)
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
      System.err.println(s"usage: ingest|query|gaps|demo ... (got: $other)")
      sys.exit(2)
  }

  private def ingest(spark: SparkSession, root: String,
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
    val (clean, errs) = pipe.runJob(bars, jobId)
    repo.transition(jobId, JobState.Completed, System.currentTimeMillis() / 1000)
    new MetricsStore(spark, s"$root/state/metrics")
      .record(Seq((now, "bars_ingested", clean.toDouble, "synthetic", "fake")))
    println(s"[ingest] job=$jobId clean=$clean errors=$errs frames=" +
      FrameSpec.defaults.map(_.name).mkString(","))
  }
}
