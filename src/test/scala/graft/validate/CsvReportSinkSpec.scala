package graft.validate

import graft.SparkSpec
import graft.core.{FrameSpec, OhlcvBar}
import graft.gen.SyntheticSource
import graft.pipeline.IngestPipeline

class CsvReportSinkSpec extends SparkSpec {

  test("pipeline writes per-symbol CSV reports for invalid bars") {
    val s = spark; import s.implicits._
    val base = tmpDir("csvrep")
    val pipe = new IngestPipeline(
      spark, s"$base/raw", s"$base/agg", s"$base/reports",
      frames = Seq(FrameSpec.F5m))
    val good = SyntheticSource.bars(spark, Seq("AAPL"), 1640995800000000000L, 10)
    val bad = Seq(
      OhlcvBar("MSFT", 1640995800000000000L, 100.0, 99.0, 101.0, 100.0, 10L), // ohlc inconsistent
      OhlcvBar("MSFT", 1640995860000000000L, 100.0, 101.0, 99.0, 100.0, -1L)  // negative volume
    ).toDF()
    val (clean, errs) = pipe.runJob(good.unionByName(bad), "job-x")
    assert(errs >= 2L)
    assert(clean == 10L)
    val reportDir = new java.io.File(s"$base/reports/job-x")
    assert(reportDir.exists(), "report directory written")
    val csv = spark.read.option("header", "true").csv(s"$base/reports/job-x")
    val reasons = csv.select("reason").collect().map(_.getString(0)).toSet
    assert(reasons.contains("ohlc_inconsistent") && reasons.contains("negative_volume"))
    assert(csv.select("symbol").distinct().collect().map(_.getString(0)).toSet == Set("MSFT"))
  }
}
