package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Pins the q1 disc-price conversion contract after the r11 sf10
  * CAST_OVERFLOW: the exact-long parity trick must (a) survive group
  * sums ~1e12 (the sf10 scale that killed the scale-8 form — x10^8
  * pushed a 5e11 sum past Long.MaxValue under ANSI) and (b) still equal
  * the exact BigDecimal sum wherever that sum is representable, since
  * the long is exact and long->double->/1e4 rounds once.
  */
class RelQueriesSpec extends SparkSpec {

  test("q1 disc-price conversion survives 1e12 sums (sf10 overflow regression)") {
    import spark.implicits._
    val dir = tmpDir("q1fix")
    // 1000 rows x ~9.5e8 discounted -> group sum ~9.5e11: past the old
    // scale-8 ceiling (9.2e10), far under the scale-4 one (9.2e14) —
    // and the MICRO-unit sum (~9.5e15) exceeds 2^53 (~9.007e15), so the
    // long->double conversion actually exercises the single-rounding
    // path the contract claims (600 rows left it exactly representable)
    val rows = (1 to 1000).map(i =>
      ("N", "O", 1.0, 999999999.99, 0.05)) ++
      (1 to 3).map(i => ("A", "F", 2.0, 100.10, 0.01))
    rows.toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")

    val out = RelQueries.queries("q1_pricing_summary")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    // exact 4dp micro-units: 999999999.99 * 0.95 = 949999999.9905
    val microsNO = 9499999999905L * 1000L // 9.4999...e15 > 2^53: rounds once
    assert(microsNO > (1L << 53), "fixture must exceed 2^53 to test rounding")
    assert(out(("N", "O")).getAs[Double]("sum_disc_price")
      === microsNO.toDouble / 1e4)
    // small-sum group stays BigDecimal-exact: 100.10 * 0.99 = 99.0990
    val microsAF = 990990L * 3L
    assert(out(("A", "F")).getAs[Double]("sum_disc_price")
      === microsAF.toDouble / 1e4)
    assert(out(("A", "F")).getAs[Long]("count_order") === 3L)
  }

  // r18: j4 is scale-routed between the r16 interval plan and the r17
  // as-of plan on the versions-side size estimate. Both branches must be
  // bit-identical on the same inputs — including the risk surface the
  // r17 AsofJoinSpec pinned: duplicate valid_from versions (only the
  // greatest version_key owns a non-empty interval), the open last
  // interval, and probes before a customer's first version (dropped).
  test("j4 routing: interval and as-of branches are bit-identical") {
    import spark.implicits._
    import java.sql.Date
    val dir = tmpDir("j4route")
    val d = (s: String) => Date.valueOf(s)
    Seq(
      // cust 1: plain adjacent intervals
      (101L, 1L, d("2024-01-10")), (102L, 1L, d("2024-02-10")),
      // cust 2: duplicate valid_from — only orderkey 202 owns the interval
      (201L, 2L, d("2024-01-05")), (202L, 2L, d("2024-01-05")),
      (203L, 2L, d("2024-03-01")),
      // cust 3: single open interval
      (301L, 3L, d("2024-06-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq(
      (101L, d("2024-01-15")), (101L, d("2024-02-10")), // boundary: 2nd version
      (102L, d("2024-02-09")), // ships before its own order: 1st version
      (201L, d("2024-01-05")), // dup valid_from boundary -> 202
      (202L, d("2024-02-28")), (203L, d("2024-03-01")),
      (301L, d("2024-05-31")), // before cust 3's first version: dropped
      (301L, d("2024-07-01")))
      .toDF("l_orderkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")

    def run(): Seq[(Long, Long)] = RelQueries.queries("j4_range_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    spark.conf.set("spark.graft.j4.intervalMaxBytes", Long.MaxValue.toString)
    val interval = try run() finally spark.conf.unset("spark.graft.j4.intervalMaxBytes")
    spark.conf.set("spark.graft.j4.intervalMaxBytes", "0")
    val asof = try run() finally spark.conf.unset("spark.graft.j4.intervalMaxBytes")

    assert(interval == asof)
    // and both equal the hand-computed oracle result
    assert(interval == Seq((101L, 2L), (102L, 1L), (202L, 2L), (203L, 1L),
      (301L, 1L)))
  }
}
