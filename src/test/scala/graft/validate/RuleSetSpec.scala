package graft.validate

import graft.SparkSpec
import graft.core.OhlcvBar

/** Each §2.11 rule fires on its crafted fixture and only there
  * (ref: src/marketpipe/validation/domain/services.py:14-124 via
  * FIXTURES.md §4).
  */
class RuleSetSpec extends SparkSpec {
  private val m = 60000000000L
  private val t0 = 1640995800000000000L

  private def reasonsFor(bars: Seq[OhlcvBar]): Map[String, Set[Long]] = {
    val s = spark; import s.implicits._
    RuleSet.validate(bars.toDF()).collect()
      .groupBy(_.getAs[String]("reason"))
      .map { case (r, rows) => r -> rows.map(_.getAs[Long]("ts_ns")).toSet }
  }

  private def ok(i: Int) =
    OhlcvBar("T", t0 + i * m, 100.0, 101.0, 99.0, 100.5, 1000L)

  test("clean bars produce no errors") {
    assert(reasonsFor((0 until 5).map(ok)).isEmpty)
  }

  test("non-positive price") {
    val bad = ok(1).copy(low = 0.0)
    assert(reasonsFor(Seq(ok(0), bad))("non_positive_price") == Set(bad.ts_ns))
  }

  test("negative volume") {
    val bad = ok(1).copy(volume = -5L)
    assert(reasonsFor(Seq(ok(0), bad))("negative_volume") == Set(bad.ts_ns))
  }

  test("ohlc inconsistent") {
    val bad = ok(1).copy(high = 99.5) // high < open
    assert(reasonsFor(Seq(ok(0), bad))("ohlc_inconsistent") == Set(bad.ts_ns))
  }

  test("minute misalignment") {
    val bad = ok(1).copy(ts_ns = t0 + m + 1234L)
    assert(reasonsFor(Seq(ok(0), bad))("timestamp_not_minute_aligned") == Set(bad.ts_ns))
  }

  test("zero-volume price move") {
    val bad = ok(1).copy(volume = 0L, open = 100.0, close = 101.0, high = 101.5)
    assert(reasonsFor(Seq(ok(0), bad))("zero_volume_price_move") == Set(bad.ts_ns))
  }

  test("extreme move >50% vs prev close") {
    val bad = ok(1).copy(open = 200.0, high = 201.0, low = 199.0, close = 200.5)
    assert(reasonsFor(Seq(ok(0), bad))("extreme_price_move") == Set(bad.ts_ns))
  }

  test("unreasonable volume > 1e9") {
    val bad = ok(1).copy(volume = 2000000000L)
    assert(reasonsFor(Seq(ok(0), bad))("unreasonable_volume") == Set(bad.ts_ns))
  }

  test("duplicate timestamps flagged on all copies") {
    val dup = ok(0)
    val rs = reasonsFor(Seq(dup, dup.copy(volume = 2000L)))
    assert(rs("duplicate_timestamp") == Set(dup.ts_ns))
    // non-monotonic also fires on the second copy (ts <= prev)
    assert(rs("non_monotonic_timestamp") == Set(dup.ts_ns))
  }

  test("split keeps clean rows only") {
    val bad = ok(1).copy(volume = -5L)
    val s = spark; import s.implicits._
    val (clean, errors) = RuleSet.split(Seq(ok(0), bad, ok(2)).toDF())
    assert(clean.count() == 2)
    assert(errors.count() == 1)
  }

  test("splitCtx over a cached context: errors re-use the cache (no second window) and equal validate()") {
    val s = spark; import s.implicits._
    val bad = ok(1).copy(volume = -5L)
    val bars = Seq(ok(0), bad, ok(2)).toDF()
    val ctx = RuleSet.withContext(bars).cache()
    try {
      val (clean, errors) = RuleSet.splitCtx(ctx)
      clean.count() // fill the cache the way runJob's raw write does
      val plan = errors.queryExecution.executedPlan.toString
      // the r17 pipeline contract: the errors branch reads the one cached
      // context instead of re-deriving source + per-symbol window
      assert(plan.contains("InMemoryTableScan"), s"expected cache scan:\n$plan")
      // the InMemoryRelation node renders its STORED plan (which built the
      // cache and rightly contains the one Window) — only the live portion
      // above it must be window-free
      val live = plan.split("InMemoryRelation")(0)
      assert(!live.contains("Window"), s"expected no second window pass:\n$plan")
      // and branch results equal the one-shot API exactly
      assert(errors.collect().map(_.toSeq).toSet ==
        RuleSet.validate(bars).collect().map(_.toSeq).toSet)
      assert(clean.count() == 2)
    } finally ctx.unpersist()
  }

  test("plan shape: all window rules share ONE symbol exchange") {
    val s = spark; import s.implicits._
    val plan = RuleSet.validate(Seq(ok(0), ok(1), ok(2)).toDF())
      .queryExecution.executedPlan.toString
    // lag-context and duplicate-count windows are both keyed on symbol —
    // they must reuse a single hashpartitioning exchange (SCALE.md's
    // validation contract), not shuffle once per rule
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one shuffle:\n$plan")
  }
}
