package graft.streaming

import graft.SparkSpec
import graft.core.FrameSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  final case class Bar(symbol: String, timestamp: java.sql.Timestamp,
                       open: Double, high: Double, low: Double, close: Double, volume: Long)
  final case class B(symbol: String, ts_ns: Long, volume: Long)
  import StreamingSpec.Ev

  private def ts(minute: Int) =
    new java.sql.Timestamp(1640995800000L + minute * 60000L)

  test("streaming tumbling resample matches batch semantics") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Bar]
    mem.addData((0 until 10).map(i =>
      Bar("AAPL", ts(i), 100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 1000L + 100L * i)))
    val out = StreamingIngest.streamingResample(mem.toDF(), FrameSpec.F5m)
    val q = out.writeStream.format("memory").queryName("agg5m")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt")).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM agg5m ORDER BY ts_ns").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Double]("open") == 100.0)
      assert(rows(0).getAs[Double]("close") == 104.5)
      assert(rows(0).getAs[Long]("volume") == 6000L)
      assert(rows(1).getAs[Long]("volume") == 8500L)
    } finally q.stop()
  }

  test("streaming dedup: duplicate (symbol, timestamp) rows collapse") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Bar]
    val b = Bar("AAPL", ts(0), 100.0, 101.0, 99.0, 100.5, 1000L)
    mem.addData(Seq(b, b.copy(volume = 9999L))) // late duplicate
    val out = StreamingIngest.streamingResample(mem.toDF(), FrameSpec.F5m)
    val q = out.writeStream.format("memory").queryName("dedup5m")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt2")).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM dedup5m").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("volume") == 1000L, "first arrival wins")
    } finally q.stop()
  }

  test("foreachBatch pipeline sink runs validate+resample per micro-batch") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Bar]
    mem.addData((0 until 10).map(i =>
      Bar("AAPL", ts(i), 100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 1000L)) :+
      Bar("AAPL", ts(10), 100.0, 101.0, 99.0, 100.5, -5L)) // invalid row
    val barsNs = mem.toDF()
      .withColumn("ts_ns", org.apache.spark.sql.functions.expr("unix_micros(timestamp) * 1000"))
      .drop("timestamp")
    @volatile var seen: Option[(Long, Long, Long)] = None
    val q = StreamingIngest.pipelineSink(barsNs, Seq(FrameSpec.F5m), tmpDir("ckpt4")) {
      (clean, errors, resampled, _) =>
        seen = Some((clean.count(), errors.count(), resampled("5m").count()))
    }.start()
    try {
      q.processAllAvailable()
      assert(seen.contains((10L, 1L, 2L)),
        s"expected 10 clean / 1 error / 2 5m buckets, got $seen")
    } finally q.stop()
  }

  test("mapGroupsWithState tracks per-symbol running state across batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[B]
    val out = StreamingIngest.trackSymbolState(spark, mem.toDF())
    val q = out.writeStream.format("memory").queryName("symstate")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("ckpt3")).start()
    try {
      mem.addData(B("AAPL", 100L, 10L), B("AAPL", 200L, 5L))
      q.processAllAvailable()
      mem.addData(B("AAPL", 150L, 7L)) // late: doesn't advance lastTs
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT * FROM symstate WHERE symbol='AAPL' ORDER BY barCount DESC").first()
      assert(last.getAs[Long]("lastTs") == 200L)
      assert(last.getAs[Long]("dayVolume") == 22L)
      assert(last.getAs[Long]("barCount") == 3L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits gap events across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val bar = 60000000000L
    val mem = MemoryStream[B]
    val out = StreamingIngest.detectGaps(spark, mem.toDF(), barNs = bar)
    val q = out.writeStream.format("memory").queryName("gapevents")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt5")).start()
    try {
      // batch 1: bars at minute 0, 1, then a 3-bar hole, then minute 5
      mem.addData(B("AAPL", 0L, 1L), B("AAPL", bar, 1L), B("AAPL", 5 * bar, 1L))
      q.processAllAvailable()
      // batch 2: a cross-batch gap (minute 5 -> minute 8) + a clean symbol
      mem.addData(B("AAPL", 8 * bar, 1L), B("MSFT", 0L, 1L))
      q.processAllAvailable()
      mem.addData(B("MSFT", bar, 1L)) // consecutive: no gap
      q.processAllAvailable()
      val gaps = spark.sql("SELECT * FROM gapevents ORDER BY symbol, gap_start_ns")
        .collect().map(r => (r.getAs[String]("symbol"),
          r.getAs[Long]("gap_start_ns") / bar, r.getAs[Long]("missing_bars")))
      assert(gaps.toSeq == Seq(("AAPL", 2L, 3L), ("AAPL", 6L, 2L)))
    } finally q.stop()
  }

  test("file-source e2e: raw files -> foreachBatch -> bars_5m view matches batch resample") {
    // the full streaming ingest loop of the reference's real-aggregation
    // e2e (ref: tests/integration/test_real_aggregation_e2e.py:95-343):
    // raw 1m-bar parquet files LAND in a source directory across two
    // micro-batches (two trading days), foreachBatch reuses the batch
    // Resampler and writes the 5m aggregate store, and the refreshed
    // bars_5m view must match the batch Resampler run over the same bars
    // row-for-row.
    import graft.gen.SyntheticSource
    import graft.storage.ParquetStore
    import graft.views.ViewCatalog
    val s = spark
    val dayNs = 86400L * 1000000000L
    val day1Start = 1704202200000000000L // 2024-01-02 14:30 UTC
    val day1 = SyntheticSource.bars(s, Seq("AAPL", "MSFT"), day1Start, 30)
    val day2 = SyntheticSource.bars(s, Seq("AAPL", "MSFT"), day1Start + dayNs, 30, seed = 43L)
    val srcDir = tmpDir("stream_src")
    day1.coalesce(1).write.mode("append").parquet(srcDir)

    val aggRoot = tmpDir("stream_agg")
    val aggStore = new ParquetStore(s, aggRoot)
    val views = new ViewCatalog(s, aggRoot)
    val streamBars = s.readStream.schema(day1.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = StreamingIngest.pipelineSink(
      streamBars, Seq(FrameSpec.F5m), tmpDir("ckpt6")) {
      (_, _, resampled, _) =>
        // per-day micro-batches touch disjoint (frame, symbol, date)
        // partitions, so dynamic overwrite keeps the sink idempotent
        aggStore.write(resampled("5m"), FrameSpec.F5m, compactPartitions = true)
    }.start()
    try {
      q.processAllAvailable()
      day2.coalesce(1).write.mode("append").parquet(srcDir) // day 2 lands later
      q.processAllAvailable()
    } finally q.stop()

    views.refreshViews()
    val cols = Seq("symbol", "ts_ns", "open", "high", "low", "close", "volume")
    val streamed = s.table("bars_5m")
      .selectExpr(cols: _*).orderBy("symbol", "ts_ns").collect().map(_.toSeq)
    val batch = graft.agg.Resampler
      .resample(day1.unionByName(day2), FrameSpec.F5m)
      .selectExpr(cols: _*).orderBy("symbol", "ts_ns").collect().map(_.toSeq)
    assert(streamed.length == 2 * 2 * 6, // 2 symbols x 2 days x 30min/5m
      s"expected 24 5m bars, got ${streamed.length}")
    assert(streamed.toSeq == batch.toSeq,
      "streamed bars_5m view must equal the batch resample row-for-row")
  }

  test("file-source restart: a new query on the same checkpoint resumes without loss or dup") {
    // T3 at the Spark level: the stream STOPS between the two days; a
    // fresh query object on the SAME checkpoint must pick up only the
    // unseen file — no re-processing of day 1 (the store write is also
    // dynamic-overwrite idempotent, but the checkpoint is what prevents
    // re-reading), no loss of day 2.
    import graft.gen.SyntheticSource
    import graft.storage.ParquetStore
    val s = spark
    val dayNs = 86400L * 1000000000L
    val start = 1704202200000000000L
    val day1 = SyntheticSource.bars(s, Seq("AAPL"), start, 10)
    val day2 = SyntheticSource.bars(s, Seq("AAPL"), start + dayNs, 10, seed = 43L)
    val srcDir = tmpDir("restart_src")
    val aggRoot = tmpDir("restart_agg")
    val ckpt = tmpDir("restart_ckpt")
    val aggStore = new ParquetStore(s, aggRoot)
    @volatile var batches = 0
    def startQuery() = StreamingIngest.pipelineSink(
      s.readStream.schema(day1.schema).option("maxFilesPerTrigger", 1).parquet(srcDir),
      Seq(FrameSpec.F5m), ckpt) { (_, _, resampled, _) =>
        batches += 1
        aggStore.write(resampled("5m"), FrameSpec.F5m, compactPartitions = true)
    }.start()

    day1.coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterDay1 = batches

    day2.coalesce(1).write.mode("append").parquet(srcDir) // lands while DOWN
    val q2 = startQuery() // fresh query, same checkpoint
    try q2.processAllAvailable() finally q2.stop()

    assert(batches == afterDay1 + 1,
      s"restart must process exactly the one unseen file, ran ${batches - afterDay1} batches")
    val got = s.read.option("basePath", aggRoot).parquet(aggRoot)
      .selectExpr("symbol", "ts_ns", "volume").orderBy("ts_ns").collect().map(_.toSeq)
    val want = graft.agg.Resampler.resample(day1.unionByName(day2), FrameSpec.F5m)
      .selectExpr("symbol", "ts_ns", "volume").orderBy("ts_ns").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq,
      "post-restart store must equal the batch resample (no loss, no dup)")
  }

  test("streaming session_window sessions equal the batch Sessionize sessions") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def evTs(sec: Int) = new java.sql.Timestamp(1640995200000L + sec * 1000L)
    // u1: [0s, 5s] | gap 11s > 10s | [16s, 20s] | [40s]; u2: one event
    val events = Seq(
      Ev("u1", evTs(0), 1L, 1.0), Ev("u1", evTs(5), 2L, 2.0),
      Ev("u1", evTs(16), 3L, 3.0), Ev("u1", evTs(20), 4L, 4.0),
      Ev("u1", evTs(40), 5L, 5.0), Ev("u2", evTs(100), 6L, 6.0))

    val mem = MemoryStream[Ev]
    mem.addData(events)
    val out = StreamingIngest.streamingSessions(
      mem.toDF(), by = Seq("user"), tsCol = "ts", gap = "10 seconds",
      valueCol = "v")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt-sess")).start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
        """SELECT user, session_start, session_end, n_events, sum_value
          |FROM sess ORDER BY user, session_start""".stripMargin)
        .collect().map(_.toSeq)
      val batch = graft.agg.Sessionize.sessionSummary(
          events.toDF(), Seq("user"), "ts",
          expr("INTERVAL 10 SECONDS"), "id", "v")
        .select(col("user"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user", "session_start")
        .collect().map(_.toSeq)
      assert(streamed.toSeq == batch.toSeq,
        "streaming sessions must equal batch Sessionize on the same rows")
      // session_window's end = last event + gap (state-eviction bound)
      val bounds = s.sql("SELECT session_end, window_end FROM sess").collect()
      assert(bounds.forall(r =>
        r.getTimestamp(1).getTime - r.getTimestamp(0).getTime == 10000L))
    } finally q.stop()
  }

  test("streaming sessions keep events exactly `gap` apart together (batch boundary rule)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def evTs(sec: Int) = new java.sql.Timestamp(1640995200000L + sec * 1000L)
    // 0s and 10s are EXACTLY gap apart -> one session under the batch
    // inclusive rule; 21s is 11s > gap after 10s -> a second session.
    // Native half-open session_window would split the first pair; the
    // 1µs gap widening in streamingSessions must keep them merged.
    val events = Seq(
      Ev("u1", evTs(0), 1L, 1.0), Ev("u1", evTs(10), 2L, 2.0),
      Ev("u1", evTs(21), 3L, 3.0))
    val mem = MemoryStream[Ev]
    mem.addData(events)
    val out = StreamingIngest.streamingSessions(
      mem.toDF(), by = Seq("user"), tsCol = "ts", gap = "10 seconds",
      valueCol = "v")
    val q = out.writeStream.format("memory").queryName("sess_edge")
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("ckpt-sess-edge")).start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
        """SELECT user, session_start, session_end, n_events, sum_value
          |FROM sess_edge ORDER BY user, session_start""".stripMargin)
        .collect().map(_.toSeq)
      val batch = graft.agg.Sessionize.sessionSummary(
          events.toDF(), Seq("user"), "ts",
          expr("INTERVAL 10 SECONDS"), "id", "v")
        .select(col("user"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user", "session_start")
        .collect().map(_.toSeq)
      assert(streamed.length == 2, s"exactly-gap pair must merge: $streamed")
      assert(streamed.toSeq == batch.toSeq,
        "streaming must equal batch Sessionize at the exact-gap boundary")
    } finally q.stop()
  }

  test("stream-stream interval join enriches within the lag bound, nulls after watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def t(sec: Int) = new java.sql.Timestamp(1640995200000L + sec * 1000L)
    val trades = MemoryStream[(String, java.sql.Timestamp, Long)]
    val quotes = MemoryStream[(String, java.sql.Timestamp, Double)]
    val out = StreamingIngest.streamIntervalJoin(
      trades.toDF().toDF("sym", "ts", "qty"),
      quotes.toDF().toDF("sym", "ts", "px"),
      key = "sym", maxLag = "10 SECONDS", watermark = "10 seconds")
    val q = out.writeStream.format("memory").queryName("ssj")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-ssj")).start()
    try {
      // AAPL trade@100 with quotes@95,98 (in window) and @50 (stale);
      // MSFT trade@100 with no quotes at all
      trades.addData(("AAPL", t(100), 10L), ("MSFT", t(100), 5L))
      quotes.addData(("AAPL", t(50), 1.0), ("AAPL", t(95), 2.0), ("AAPL", t(98), 3.0))
      q.processAllAvailable()
      // advance both watermarks far past 100s so the unmatched MSFT row
      // is emitted as a left-outer null
      trades.addData(("FLUSH", t(1000), 0L))
      quotes.addData(("FLUSH", t(1000), 0.0))
      q.processAllAvailable()
      val rows = s.sql(
        """SELECT sym, qty, px_r FROM ssj WHERE sym <> 'FLUSH'
          |ORDER BY sym, px_r NULLS FIRST""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
      assert(rows.toSeq === Seq(
        ("AAPL", 10L, Some(2.0)), // quote@95 within [90, 100]
        ("AAPL", 10L, Some(3.0)), // quote@98
        ("MSFT", 5L, None)))      // no quote: outer null after watermark
    } finally q.stop()
  }
}

object StreamingSpec {
  final case class Ev(user: String, ts: java.sql.Timestamp, id: Long, v: Double)
}
