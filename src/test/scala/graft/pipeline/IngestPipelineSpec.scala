package graft.pipeline

import graft.SparkSpec
import graft.core.FrameSpec
import graft.gen.SyntheticSource

/** E2E quickstart: generate -> validate -> store -> aggregate -> SQL
  * (ref: tests/integration/test_full_pipeline.py shape).
  */
class IngestPipelineSpec extends SparkSpec {

  test("full pipeline: synthetic bars through raw + agg + views + SQL") {
    val base = tmpDir("pipe")
    val pipe = new IngestPipeline(
      spark, s"$base/raw", s"$base/agg", s"$base/reports",
      frames = Seq(FrameSpec.F5m, FrameSpec.F1d))
    val bars = SyntheticSource.bars(
      spark, Seq("AAPL", "MSFT"), 1640995800000000000L, nBars = 60)
    val (clean, errs) = pipe.runJob(bars, "job-1")
    assert(clean == 120L, s"all synthetic bars valid, got $clean clean / $errs errors")
    val out = pipe.query("SELECT symbol, count(*) AS n FROM bars_5m GROUP BY symbol")
    val counts = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("AAPL") == 12L) // 60 1m bars from an aligned start -> 12 5m buckets
    assert(counts("MSFT") == 12L)
    assert(pipe.query("SELECT * FROM bars_1d").count() == 2L)
  }

  test("re-running the same job is idempotent (dynamic partition overwrite)") {
    val base = tmpDir("pipe_idem")
    val pipe = new IngestPipeline(
      spark, s"$base/raw", s"$base/agg", s"$base/reports",
      frames = Seq(FrameSpec.F5m))
    val bars = SyntheticSource.bars(spark, Seq("AAPL"), 1640995800000000000L, 30)
    pipe.runJob(bars, "job-1")
    val n1 = pipe.query("SELECT count(*) AS n FROM bars_5m").first().getLong(0)
    pipe.runJob(bars, "job-1") // re-run: must replace, not append
    val n2 = pipe.query("SELECT count(*) AS n FROM bars_5m").first().getLong(0)
    assert(n1 == n2, s"re-run appended: $n1 -> $n2")
  }

  test("empty-frame views fall back to typed empty relations") {
    val base = tmpDir("pipe2")
    val pipe = new IngestPipeline(
      spark, s"$base/raw", s"$base/agg", s"$base/reports",
      frames = Seq(FrameSpec.F5m))
    val bars = SyntheticSource.bars(spark, Seq("TEST"), 1640995800000000000L, 5)
    pipe.runJob(bars, "job-1")
    // 15m never aggregated -> empty view, but the query must not error (S2)
    assert(pipe.query("SELECT * FROM bars_15m WHERE symbol = 'TEST'").count() == 0L)
  }

  test("synthetic source is deterministic and OHLC-consistent") {
    val a = SyntheticSource.bars(spark, Seq("AAPL"), 0L, 100, seed = 7L)
    val b = SyntheticSource.bars(spark, Seq("AAPL"), 0L, 100, seed = 7L)
    import org.apache.spark.sql.functions._
    assert(a.exceptAll(b).count() == 0L, "same seed, same bars")
    val bad = a.where(
      col("high") < col("open") || col("high") < col("close") ||
      col("low") > col("open") || col("low") > col("close") || col("volume") < 0)
    assert(bad.count() == 0L, "OHLC invariants hold")
  }
}
