package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator queries over the TPC-H-ish tables: scans,
  * projections/filters, joins (semi/anti/outer/range), aggregations,
  * window functions, sorts/top-K, set ops, scalar functions.
  * Each mirrors an inventory row from SURVEY §2.
  */
object RelQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1/P2: scan + projection + range predicate (pushed to parquet)
    "p1_scan_project_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_quantity") >= 30.0 && col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // P3/P5: equality + null filters
    "p3_equality_filter" -> ((s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderstatus") === "F" && col("o_orderpriority").isNotNull)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // A-class: grouped agg with decimal-exact money sums (flagship TPC-H q1 shape)
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // decimal-exact accumulation; DOUBLE on the output edge so the
          // canonical row encoding matches engines that promote sum types
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          // emit via exact-long -> double -> one division so the double
          // equals any engine's (int/10^scale) conversion, not
          // BigDecimal's correctly-rounded one (they differ by 1 ulp
          // above 2^53). Micro-units are SCALE 4, not 8: price (2dp) x
          // (1 - discount) (2dp) is exact at 4dp, so the long is still
          // exact, and the overflow ceiling moves from 9.2e10 to 9.2e14
          // group sums — sf10's ~1.5e12 N/O sum killed the scale-8 form
          // with CAST_OVERFLOW under ANSI (VERDICT r11; spec'd in
          // RelQueriesSpec "q1 disc-price conversion survives 1e12 sums")
          ((sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("decimal(38,8)")) * lit(10000L)).cast("long").cast("double") /
            lit(1.0e4)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // J-class: broadcast dimension join chain + agg (TPC-H q5 shape)
    "j_dim_join_chain" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("customers"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("sum_acctbal"))
        .orderBy("r_name", "n_name")),

    // J1: left-semi join (IN-subquery shape, ref scd_writer.py:128-149)
    "j1_semi_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 100000.0)
      t(s, dir, "customer")
        .join(bigOrders.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J2: anti join (NOT EXISTS shape, ref cli/jobs.py:519-535)
    "j2_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    // J3: snapshot-vs-master full-outer diff classification
    // (ref ingestion/pipeline/symbol_pipeline.py:65-134): customers with
    // recent orders = "snapshot"; classify against the full dimension.
    "j3_diff_classify" -> ((s, dir) => {
      val snapshot = t(s, dir, "orders")
        .groupBy("o_custkey").agg(max("o_totalprice").as("latest_price"))
      t(s, dir, "customer")
        .join(snapshot, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("key"),
          when(col("c_custkey").isNull, "insert")
            .when(col("o_custkey").isNull, "absent")
            .when(col("latest_price") > col("c_acctbal"), "update")
            .otherwise("unchanged").as("action"))
        .groupBy("action").agg(count(lit(1)).as("n"))
        .orderBy("action")
    }),

    // J4: point-in-time range join (ref create_symbol_views.sql:10-18):
    // each order joined to the customer's account-balance "version" —
    // here: order matched to its customer's order-sequence interval.
    //
    // SCALE-ROUTED between two result-identical plans (r18; VERDICT r17
    // item 3 — the d2/d2b routing pattern applied to the join strategy):
    //
    //   - interval plan (the r16 shape): equi-join on custkey + range
    //     post-filter against adjacent [valid_from, valid_to) intervals.
    //     Streams |versions_per_cust| × |probes_per_cust| rows per
    //     customer through the filter — ~2× FASTER than the as-of plan
    //     at mid scale (sf10 measured 7.7 vs 14.3 s fast2, r17), but the
    //     expansion is superlinear in scale (6.0e9 intermediate rows,
    //     10 GB spill, 124 s GC per run at sf100).
    //   - as-of plan (the r17 shape): union + one window pass via
    //     AsofJoin — zero row expansion, sf100 spill 0, decade ratio
    //     8.2× (sublinear), but its union sort constants lose to the
    //     interval plan's cheap expansion at mid scale.
    //
    // The route keys on the optimizer's size estimate of the VERSIONS
    // side (a pure scan → ≈ file bytes; NOT a testdata path): expansion
    // risk grows with the version table, so small versions take the
    // interval plan and at-scale versions the as-of plan. Threshold
    // `spark.graft.j4.intervalMaxBytes` (default 512 MB: sf10's 240 MB
    // orders routes interval, sf100's 1.8 GB routes as-of; a 100 TB
    // orders table is 3 orders of magnitude past it). Equality of the
    // two plans: the intervals are ADJACENT by construction (valid_to =
    // lead(valid_from) per custkey), so interval containment ≡ "the
    // version with the greatest valid_from <= l_shipdate" — including
    // duplicate valid_from values, where only the greatest version_key
    // owns a non-empty interval and AsofJoin's max-payload tie-break
    // picks the same winner — pinned by AsofJoinSpec's
    // interval-equivalence test and the unchanged DuckDB oracle row
    // (which exercises the interval branch at oracle scale; both
    // branches are bit-identical on the same inputs).
    "j4_range_join" -> ((s, dir) => {
      val intervalMax = s.conf.getOption("spark.graft.j4.intervalMaxBytes")
        .flatMap(_.toLongOption).getOrElse(512L << 20)
      val versionsBase = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
          col("o_orderkey").as("version_key"))
      val matched =
        if (graft.core.Materialize.estimateBytes(versionsBase) <= intervalMax) {
          val versions = versionsBase
            .withColumnRenamed("k", "v_custkey")
            .withColumnRenamed("ts", "valid_from")
            .withColumn("valid_to", lead(col("valid_from"), 1).over(
              Window.partitionBy("v_custkey")
                .orderBy(col("valid_from"), col("version_key"))))
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_shipdate")
            .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
              col("l_orderkey") === col("o_orderkey"))
            .join(versions,
              col("o_custkey") === col("v_custkey") &&
                col("l_shipdate") >= col("valid_from") &&
                (col("valid_to").isNull || col("l_shipdate") < col("valid_to")))
        } else {
          val probes = t(s, dir, "lineitem")
            .select("l_orderkey", "l_shipdate")
            .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
              col("l_orderkey") === col("o_orderkey"))
            .select(col("o_custkey").as("k"), col("l_shipdate").as("ts"))
          graft.joins.AsofJoin.asofJoin(probes, versionsBase,
              on = "ts", by = Seq("k"), rightCols = Seq("version_key"))
            .where(col("version_key").isNotNull) // pre-first-version: inner drop
        }
      matched
        .groupBy("version_key")
        .agg(count(lit(1)).as("n_lineitems"))
        .orderBy("version_key")
    }),

    // J6: as-of join (backward, inclusive) — each view event matched to
    // the user's latest purchase at-or-before it (trade ← latest-quote
    // shape; see graft.joins.AsofJoin for the one-shuffle plan)
    "j5_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val views = ev.where(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "ts_ns")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("last_purchase_value"))
      graft.joins.AsofJoin.asofJoin(
          views, purchases, on = "ts", by = Seq("user_id"),
          rightCols = Seq("last_purchase_value"),
          matchedOnAs = Some("purchase_ts"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
          col("last_purchase_value"),
          (unix_micros(col("purchase_ts")) * lit(1000L)).as("purchase_ts_ns"))
        .orderBy("event_id")
    }),

    // J7: as-of join (forward, strict, bounded) — click-to-purchase
    // conversion: first purchase strictly after each click, within 24h
    "j6_asof_forward_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "ts_ns")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("conv_value"))
      graft.joins.AsofJoin.asofJoin(
          clicks, purchases, on = "ts", by = Seq("user_id"),
          rightCols = Seq("conv_value"),
          direction = "forward", allowExactMatches = false,
          tolerance = Some(expr("INTERVAL 24 HOURS")),
          matchedOnAs = Some("conv_ts"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
          col("conv_value"),
          (unix_micros(col("conv_ts")) * lit(1000L)).as("conv_ts_ns"))
        .orderBy("event_id")
    }),

    // W10: gap-based sessionization — 30-minute-gap sessions per user
    // with per-session summaries (graft.agg.Sessionize)
    "w10_sessionize" -> ((s, dir) =>
      graft.agg.Sessionize.sessionSummary(
          Tables.events(s, dir)
            .select(col("user_id"), col("ts"), col("event_id"),
              col("value").cast("decimal(18,4)").as("value")),
          by = Seq("user_id"), tsCol = "ts",
          gap = expr("INTERVAL 30 MINUTES"), tieCol = "event_id",
          valueCol = "value")
        .select(col("user_id"), col("session_seq"), col("n_events"),
          (unix_micros(col("session_start")) * lit(1000L)).as("start_ns"),
          (unix_micros(col("session_end")) * lit(1000L)).as("end_ns"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("user_id", "session_seq")),

    // W1: dedup rank — keep latest order per customer, tie-break orderkey
    // (ref symbol_normalizer.sql:25-44)
    "w1_dedup_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // W2: dense surrogate-ID assignment by natural key order
    // (ref symbol_normalizer.sql:46-82) — through the SCALABLE path
    // (range-partition + zipWithIndex, no single-partition window); ids
    // are identical to the global-window variant by construction
    "w2_surrogate_ids" -> ((s, dir) =>
      graft.symbols.Normalizer.assignIdsScalable(
          t(s, dir, "nation").withColumn("natural_key", col("n_name")),
          numPartitions = 4)
        .select("id", "n_name", "n_nationkey")
        .orderBy("id")),

    // W3: latest-version-per-key view (ref create_symbol_views.sql:27-37)
    "w3_latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("latest_event"), col("event_type"))
        .orderBy("user_id")
    }),

    // O4/A10: top-K by count (ref repositories.py:138-143)
    "o4_topk_counts" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("event_type"))
        .limit(5)),

    // U1: union-all availability summary across two "frames"
    // (ref duckdb_views.py:128-162)
    "u1_union_availability" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        lit("orders").as("src"), to_date(col("o_orderdate")).as("d"))
      val e = Tables.events(s, dir).select(
        lit("events").as("src"), to_date(col("ts")).as("d"))
      o.unionByName(e)
        .groupBy("src")
        .agg(countDistinct(col("d")).as("days"), count(lit(1)).as("n_rows"))
        .orderBy("src")
    }),

    // U3: gap detection — expected-vs-existing date set difference
    // (ref gap_detector.py:33-104): days in Jan 2024 with no events per user
    "u3_gap_detect" -> ((s, dir) => {
      val expected = Tables.events(s, dir)
        .select(col("user_id")).distinct()
        .crossJoin(
          s.range(1).select(explode(sequence(
            to_date(lit("2024-01-01")), to_date(lit("2024-01-30")))).as("d")))
      val existing = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      expected.except(existing)
        .groupBy("user_id").agg(count(lit(1)).as("missing_days"))
        .orderBy("user_id")
    }),

    // A6: availability detail per (src, day) with distinct counts
    "a6_availability_detail" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
        .orderBy("event_type", "d")),

    // A12/A13: distinct + point aggregates
    "a12_distinct_symbols" -> ((s, dir) =>
      Tables.events(s, dir).select("event_type").distinct().orderBy("event_type")),
    "a13_point_aggregates" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(max(col("ts_ns")).as("max_ts_ns"), count(lit(1)).as("n"))
        .orderBy("user_id")),

    // A15: multi-level aggregation — ROLLUP over (event_type, day) with
    // grouping_id disambiguating subtotal levels (OLAP hierarchy rollup;
    // one shuffle, Spark expands grouping sets map-side)
    "a15_rollup" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("d"),
          col("value").cast("decimal(18,4)").as("v"))
        .rollup("event_type", "d")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("double").as("sum_value"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("event_type"), col("d"))),

    // A16: pivot — fixed category list to wide conditional aggregates
    // (engine-neutral: the oracle states it as FILTERed counts)
    "a16_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // A19: hopping (sliding) event-time windows — 10-minute windows
    // every 5 minutes, each event lands in exactly two (SURVEY §2.9
    // lists sliding windows as a reference non-goal; built here as the
    // Spark-native extension, same map-side bucket expansion as the
    // oracle's two UNION legs). Integer bucket math on ts_ns with LONG
    // group keys, not `window(ts, "10 minutes", "5 minutes")`: the
    // TimeWindow form expands through an Expand node with per-projection
    // timestamp arithmetic and groups on a struct(timestamp, timestamp)
    // key — measured at sf10 as the sweep's worst JIT-sensitive row
    // (same stage: 134.6 s task-CPU after four unrelated agg rows vs
    // 15.2 s steady-state, SCALE.md r13). A 2-element long-array explode
    // plus (long, string) keys is the hashing-cheapest shape and the
    // identical result (for length = 2x slide the containing windows are
    // exactly b and b - slide, b = ts_ns - pmod(ts_ns, slide)). pmod, not
    // %: Spark's remainder truncates toward zero, so a pre-epoch ts_ns
    // would land in the window ABOVE it instead of the one containing it
    // — pmod is the floor alignment TimeWindow used. Null ts_ns rows are
    // filtered (TimeWindow's grouping dropped them; bare bucket math
    // would keep them under a null key).
    "a19_hopping_window" -> ((s, dir) => {
      val slide = lit(300000000000L) // 5 minutes in ns
      Tables.events(s, dir)
        .where(col("ts_ns").isNotNull)
        .select(col("event_type"), col("value").cast("decimal(18,4)").as("v"),
          (col("ts_ns") - pmod(col("ts_ns"), slide)).as("b"))
        .select(col("event_type"), col("v"),
          explode(array(col("b"), col("b") - slide)).as("win_start_ns"))
        .groupBy("win_start_ns", "event_type")
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_v"))
        .orderBy("win_start_ns", "event_type")
        .select("win_start_ns", "event_type", "n", "sum_v")
    }),

    // A18: HLL approximate distinct — the 100 TB cardinality path
    // (countDistinct shuffles every distinct value; HLL++ ships a
    // constant-size sketch). The oracle can't reproduce another engine's
    // sketch, so the accuracy CONTRACT is the checked output: the query
    // emits exact counts plus a bound assertion the oracle states as
    // `true` — a sketch drifting past 5% flips the boolean and fails
    // the hash compare.
    "a18_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("__a"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__a") - col("exact_users")) <=
            col("exact_users") * 0.05).as("approx_within_5pct"))
        .orderBy("event_type")),

    // A17: unpivot/melt — wide numeric columns to long (field, v) rows,
    // the inverse of a16 (stated in the oracle as a UNION ALL, the
    // engine-neutral definition)
    "a17_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_orderkey") <= 2000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity").cast("double").as("l_quantity"),
            col("l_discount").cast("double").as("l_discount")),
          "field", "v")
        .orderBy("l_orderkey", "l_linenumber", "field")),

    // W11: ntile quartile assignment within each key's events — the
    // windowed bucketing primitive (per-key, so no global sort at scale)
    "w11_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("event_id")
    }),

    // F4/F6: natural-key construction + regex validation
    // (ref symbol_normalizer.sql:29-33; value_objects.py:33-41)
    "f4_natural_key" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          concat_ws("|", upper(col("c_name")), col("c_mktsegment")).as("natural_key"),
          upper(col("c_mktsegment")).rlike("^[A-Z0-9\\.]{1,10}$").as("valid_symbol"))
        .orderBy("c_custkey")),

    // F7/F8: decimal quantize + math (pct change shape, ref entities.py:178-204)
    "f8_math_pct_change" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("l_extendedprice")) / col("l_extendedprice") * 100.0, 4).as("pct_disc"),
          // quantize-to-4dp through DECIMAL, emitted as DOUBLE (exact: money
          // values at <=2dp are representable)
          col("l_extendedprice").cast("decimal(18,4)").cast("double").as("price_4dp"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F9: market-hours predicate (fixed -5h offset, deliberately no DST —
    // parity with ref value_objects.py:254-266)
    "f9_market_hours" -> ((s, dir) => {
      val et = col("ts") - expr("INTERVAL 5 HOURS")
      val mins = hour(et) * 60 + minute(et)
      Tables.events(s, dir)
        .select(col("event_id"),
          (dayofweek(et).between(2, 6) &&
            mins >= (9 * 60 + 30) && mins < (16 * 60)).as("in_market_hours"))
        .groupBy("in_market_hours").agg(count(lit(1)).as("n"))
        .orderBy("in_market_hours")
    })
  )

  def oracles: Map[String, String] = Map(
    "p1_scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 30.0 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p3_equality_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,8))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "j_dim_join_chain" ->
      """SELECT r_name, n_name, count(*) AS customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j1_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j2_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j3_diff_classify" ->
      """WITH snapshot AS (
        |  SELECT o_custkey, max(o_totalprice) AS latest_price FROM orders GROUP BY o_custkey)
        |SELECT CASE WHEN c_custkey IS NULL THEN 'insert'
        |            WHEN o_custkey IS NULL THEN 'absent'
        |            WHEN latest_price > c_acctbal THEN 'update'
        |            ELSE 'unchanged' END AS action, count(*) AS n
        |FROM customer FULL OUTER JOIN snapshot ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j4_range_join" ->
      """WITH versions AS (
        |  SELECT o_custkey AS v_custkey, o_orderdate AS valid_from, o_orderkey AS version_key,
        |         lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders),
        |li AS (
        |  SELECT l.*, o.o_custkey, o.o_orderdate FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT version_key, count(*) AS n_lineitems
        |FROM li JOIN versions ON o_custkey = v_custkey
        |  AND l_shipdate >= valid_from AND (valid_to IS NULL OR l_shipdate < valid_to)
        |GROUP BY version_key ORDER BY version_key""".stripMargin,
    "j5_asof_join" ->
      """SELECT l.event_id, l.user_id, epoch_ns(l.ts) AS ts_ns,
        |       r.value AS last_purchase_value, epoch_ns(r.ts) AS purchase_ts_ns
        |FROM (SELECT * FROM events WHERE event_type = 'view') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "j6_asof_forward_tolerance" ->
      """WITH u AS (
        |  SELECT user_id, ts, NULL::BIGINT AS event_id, value, 0 AS is_left
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, NULL::DOUBLE, 1 AS is_left
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_left = 0 THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, is_left DESC ROWS UNBOUNDED PRECEDING) AS mval,
        |    last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, is_left DESC ROWS UNBOUNDED PRECEDING) AS mts
        |  FROM u)
        |SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
        |  CASE WHEN mts IS NOT NULL AND mts - ts <= INTERVAL 24 HOURS THEN mval END AS conv_value,
        |  CASE WHEN mts IS NOT NULL AND mts - ts <= INTERVAL 24 HOURS THEN epoch_ns(mts) END AS conv_ts_ns
        |FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin,
    "w10_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,4)) AS value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT *, CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTES THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM x)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |       epoch_ns(min(ts)) AS start_ns, epoch_ns(max(ts)) AS end_ns,
        |       CAST(sum(value) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "w1_dedup_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "w2_surrogate_ids" ->
      """SELECT row_number() OVER (ORDER BY n_name) AS id, n_name, n_nationkey
        |FROM nation ORDER BY id""".stripMargin,
    "w3_latest_per_key" ->
      """SELECT user_id, event_id AS latest_event, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "o4_topk_counts" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5""".stripMargin,
    "u1_union_availability" ->
      """WITH u AS (
        |  SELECT 'orders' AS src, CAST(o_orderdate AS DATE) AS d FROM orders
        |  UNION ALL
        |  SELECT 'events' AS src, CAST(ts AS DATE) AS d FROM events)
        |SELECT src, count(DISTINCT d) AS days, count(*) AS n_rows
        |FROM u GROUP BY src ORDER BY src""".stripMargin,
    "u3_gap_detect" ->
      """WITH expected AS (
        |  SELECT user_id, CAST(d AS DATE) AS d
        |  FROM (SELECT DISTINCT user_id FROM events),
        |       (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS d)),
        |existing AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT user_id, count(*) AS missing_days
        |FROM (SELECT * FROM expected EXCEPT SELECT * FROM existing)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a6_availability_detail" ->
      """SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
        |       count(DISTINCT user_id) AS users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a12_distinct_symbols" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "a13_point_aggregates" ->
      """SELECT user_id, max(epoch_ns(ts)) AS max_ts_ns, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a15_rollup" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |         CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events)
        |SELECT event_type, d, count(*) AS n,
        |       CAST(sum(v) AS DOUBLE) AS sum_value,
        |       CAST(GROUPING(event_type, d) AS BIGINT) AS gid
        |FROM e GROUP BY ROLLUP(event_type, d)
        |ORDER BY gid, event_type, d""".stripMargin,
    "a16_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a19_hopping_window" ->
      """WITH b AS (
        |  SELECT epoch_ns(ts) AS tn, event_type, CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events WHERE ts IS NOT NULL),
        |w AS (
        |  SELECT tn - ((tn % 300000000000) + 300000000000) % 300000000000 AS ws,
        |         event_type, v FROM b
        |  UNION ALL
        |  SELECT tn - ((tn % 300000000000) + 300000000000) % 300000000000
        |       - 300000000000 AS ws, event_type, v FROM b)
        |SELECT ws AS win_start_ns, event_type, count(*) AS n,
        |       CAST(sum(v) AS DOUBLE) AS sum_v
        |FROM w GROUP BY ws, event_type
        |ORDER BY win_start_ns, event_type""".stripMargin,
    "a18_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       true AS approx_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a17_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS field, CAST(l_quantity AS DOUBLE) AS v
        |FROM lineitem WHERE l_orderkey <= 2000
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount' AS field, CAST(l_discount AS DOUBLE) AS v
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber, field""".stripMargin,
    "w11_ntile" ->
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS quartile
        |FROM events ORDER BY event_id""".stripMargin,
    "f4_natural_key" ->
      """SELECT c_custkey,
        |  concat_ws('|', upper(c_name), c_mktsegment) AS natural_key,
        |  regexp_matches(upper(c_mktsegment), '^[A-Z0-9\.]{1,10}$') AS valid_symbol
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f8_math_pct_change" ->
      """SELECT l_orderkey, l_linenumber,
        |  round((l_extendedprice * (1.0 - l_discount) - l_extendedprice) / l_extendedprice * 100.0, 4) AS pct_disc,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE) AS price_4dp
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f9_market_hours" ->
      """WITH et AS (SELECT event_id, ts - INTERVAL 5 HOUR AS t FROM events)
        |SELECT (dayofweek(t) + 1 BETWEEN 2 AND 6
        |        AND hour(t) * 60 + minute(t) >= 570
        |        AND hour(t) * 60 + minute(t) < 960) AS in_market_hours,
        |       count(*) AS n
        |FROM et GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
