package graft.agg

import graft.SparkSpec
import graft.core.{FrameSpec, OhlcvBar}

/** Golden resample fixture from the reference's unit tests
  * (ref: tests/unit/aggregation/test_duckdb_engine.py:33-91, via
  * FIXTURES.md §1): 10 consecutive 1m AAPL bars -> exactly 2 5m bars.
  */
class ResamplerSpec extends SparkSpec {
  private val t0 = 1640995800000000000L // minute-aligned, not 5m-aligned

  private def bars10 = {
    val s = spark; import s.implicits._
    (0 until 10).map { i =>
      OhlcvBar("AAPL", t0 + i * 60000000000L,
        100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 1000L + 100L * i)
    }.toDF()
  }

  test("golden 5m resample: 10 1m bars -> 2 bars with exact OHLCV") {
    val out = Resampler.resample(bars10, FrameSpec.F5m)
      .orderBy("ts_ns").collect()
    assert(out.length == 2)
    val b0 = out(0); val b1 = out(1)
    // t0 = ...:30:00; 5m buckets split 10 bars into 5 + 5
    assert(b0.getAs[Double]("open") == 100.0)
    assert(b0.getAs[Double]("high") == 105.0)
    assert(b0.getAs[Double]("low") == 99.0)
    assert(b0.getAs[Double]("close") == 104.5)
    assert(b0.getAs[Long]("volume") == 6000L)
    assert(b1.getAs[Double]("open") == 105.0)
    assert(b1.getAs[Double]("high") == 110.0)
    assert(b1.getAs[Double]("low") == 104.0)
    assert(b1.getAs[Double]("close") == 109.5)
    assert(b1.getAs[Long]("volume") == 8500L)
  }

  test("bucket label is floor(ts/5m)*5m") {
    val out = Resampler.resample(bars10, FrameSpec.F5m)
      .orderBy("ts_ns").collect()
    assert(out(0).getAs[Long]("ts_ns") % FrameSpec.F5m.nanos == 0L)
    assert(out(1).getAs[Long]("ts_ns") - out(0).getAs[Long]("ts_ns") == FrameSpec.F5m.nanos)
  }

  test("daily resample labels buckets at 13:30 UTC market open") {
    val out = Resampler.resampleDaily(bars10).collect()
    assert(out.length == 1)
    val dayNs = 86400L * 1000000000L
    val expected = (t0 - t0 % dayNs) + 48600L * 1000000000L
    assert(out(0).getAs[Long]("ts_ns") == expected)
    assert(out(0).getAs[Double]("open") == 100.0)
    assert(out(0).getAs[Double]("close") == 109.5)
  }

  test("plan shape: resample is ONE shuffle with map-side partial aggregation") {
    val plan = Resampler.resample(bars10, FrameSpec.F5m)
      .queryExecution.executedPlan.toString
    // the SCALE.md contract: one exchange on (symbol, bucket); the
    // min_by/max_by/sum aggregates combine map-side, so the exchange
    // carries partial rows, never raw bars
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"))
    assert(plan.contains("partial_min_by") || plan.contains("partial_minby") ||
      plan.split("HashAggregate").length - 1 >= 2, // partial + final pair
      s"expected partial aggregation below the exchange:\n$plan")
    assert(!plan.contains("Window"), "resample must not plan a window")
  }

  test("resample invariants: volume conserved, high is max, low is min") {
    val src = bars10
    Seq(FrameSpec.F5m, FrameSpec.F15m, FrameSpec.F1h).foreach { f =>
      val out = Resampler.resample(src, f)
      val inVol = src.agg(org.apache.spark.sql.functions.sum("volume")).first().getLong(0)
      val outVol = out.agg(org.apache.spark.sql.functions.sum("volume")).first().getLong(0)
      assert(inVol == outVol, s"volume conservation for ${f.name}")
      val maxIn = src.agg(org.apache.spark.sql.functions.max("high")).first().getDouble(0)
      val maxOut = out.agg(org.apache.spark.sql.functions.max("high")).first().getDouble(0)
      assert(maxIn == maxOut)
    }
  }
}
