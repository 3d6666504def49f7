package graft.agg

import graft.SparkSpec
import graft.core.{FrameSpec, OhlcvBar}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for resample invariants (SURVEY §5: an improvement over
  * the reference, which has no property-based tests):
  * volume conservation, high = max member high, low = min member low,
  * bucket alignment, bar count <= member count.
  */
class ResamplerPropertySpec extends SparkSpec {

  private val barGen: Gen[OhlcvBar] = for {
    sym <- Gen.oneOf("AAPL", "MSFT", "TSLA")
    minute <- Gen.choose(0, 2000)
    mid <- Gen.choose(1.0, 500.0)
    spread <- Gen.choose(0.0, 20.0)
    oc1 <- Gen.choose(-1.0, 1.0)
    oc2 <- Gen.choose(-1.0, 1.0)
    vol <- Gen.choose(0L, 1000000L)
  } yield {
    val open = mid + oc1 * spread / 2
    val close = mid + oc2 * spread / 2
    OhlcvBar(sym, 1640995800000000000L + minute * 60000000000L,
      open, math.max(open, close) + spread, math.min(open, close) - spread,
      close, vol)
  }

  // duplicate (symbol, ts_ns) would make min_by/max_by tie-ambiguous; the
  // engine dedups before resampling (S4/T4), so generate post-dedup input
  private val barsGen: Gen[List[OhlcvBar]] =
    Gen.listOfN(120, barGen).map(
      _.groupBy(b => (b.symbol, b.ts_ns)).values.map(_.head).toList)

  test("resample invariants hold for arbitrary valid bars") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    (1 to 10).foreach { trial =>
      val bars = barsGen(Gen.Parameters.default, Seed(trial.toLong))
        .getOrElse(Nil)
      assert(bars.nonEmpty, s"generator produced no bars for trial $trial")
      locally {
        val df = bars.toDF()
        val out = Resampler.resample(df, FrameSpec.F15m).cache()
        try {
          val inAgg = df.agg(sum("volume"), max("high"), min("low")).first()
          val outAgg = out.agg(sum("volume"), max("high"), min("low")).first()
          assert(outAgg.getLong(0) == inAgg.getLong(0), "volume conserved")
          assert(outAgg.getDouble(1) == inAgg.getDouble(1), "global high preserved")
          assert(outAgg.getDouble(2) == inAgg.getDouble(2), "global low preserved")
          assert(out.where(col("ts_ns") % FrameSpec.F15m.nanos =!= 0).count() == 0,
            "bucket labels aligned")
          assert(out.count() <= df.count(), "no more buckets than bars")
          // per-bucket: open/close are member values
          val joined = out.as("o").join(df.as("b"),
            col("o.symbol") === col("b.symbol") &&
              col("b.ts_ns") >= col("o.ts_ns") &&
              col("b.ts_ns") < col("o.ts_ns") + FrameSpec.F15m.nanos)
          val badOpen = joined.groupBy("o.symbol", "o.ts_ns")
            .agg(first("o.open").as("open"), collect_set("b.open").as("members"))
            .where(!array_contains(col("members"), col("open")))
          assert(badOpen.count() == 0, "open must be a member bar's open")
        } finally out.unpersist()
      }
    }
  }
}
