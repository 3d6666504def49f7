package graft.queries

import graft.core.Tables
import graft.storage.ParquetStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining inventory operators: append-dedup upsert (S4), partial
  * trade_count aggregation (A3), metrics window average (A7), null-ratio
  * profile (A9), ns<->timestamp conversions (F3), paged provider ingest
  * (S13).
  */
object MiscQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S13: full paged-client ingest — the rate-limited retrying REST client
    // drains the fake wire-format server (deterministic integer-arithmetic
    // bars), lands a distributed frame, aggregates. The oracle regenerates
    // the same bars from the index formula and must agree exactly.
    "s13_provider_ingest" -> ((s, dir) => {
      import graft.sources._
      val server = new FakeBarServer(nBars = 1000, pageSize = 137)
      val client = new BarFeedClient(
        ClientConfig("http://fake"), AuthStrategy.NoAuth, server)
      PagedProviderSource.ingest(s, client, "TEST", 0L, 1000L * 60000000000L)
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_bars"),
          sum(col("volume")).as("total_volume"),
          min(col("ts_ns")).as("first_ts"), max(col("ts_ns")).as("last_ts"),
          sum(col("close").cast("decimal(18,2)")).cast("double").as("sum_close"))
        .orderBy("symbol")
    }),

    // S4: keep-last upsert — incoming (modified close) wins over existing
    "s4_append_dedup" -> ((s, dir) => {
      val existing = BarQueries.eventBars(s, dir)
      val incoming = existing
        .where(col("volume") % 2 === 0)
        .withColumn("close", col("close") * 2.0)
      ParquetStore.appendDedup(existing, incoming)
        .orderBy("symbol", "ts_ns")
    }),

    // A3: partial trade_count — null unless every member has it
    // (ref: domain/services.py:141-263 trade_count semantics)
    "a3_partial_trade_count" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .withColumn("tc",
          when(col("l_linenumber") <= 4, col("l_linenumber")).cast("long"))
      li.groupBy("l_orderkey")
        .agg(
          when(count(col("tc")) === count(lit(1)), sum(col("tc")))
            .as("trade_count"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    }),

    // A7: metrics window average: AVG(value) WHERE name=? AND ts>=?
    // (ref: metrics.py:201-216)
    "a7_metrics_avg" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(col("event_type") === "click" &&
          col("ts_ns") >= 1705000000000000000L)
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_value"),
          count(lit(1)).as("n"))),

    // A9: one-pass null-ratio profile (ref: symbol_pipeline.py:140-170)
    "a9_null_ratio" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .withColumn("maybe_null",
          when(col("o_totalprice") <= 100000.0, col("o_totalprice")))
      o.agg(
        (sum(col("o_orderpriority").isNull.cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("null_ratio_priority"),
        (sum(col("maybe_null").isNull.cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("null_ratio_bigprice"))
    }),

    // F3: ns <-> timestamp <-> iso conversions (ref: value_objects.py:183-288)
    "f3_time_convert" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          col("ts_ns"),
          to_date(col("ts")).as("d"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("m"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_sec"))
        .orderBy("event_id")),

    // F14: semi-structured extraction — schema-on-read over the JSON
    // props column (the engine-side twin of the providers' wire-JSON
    // parsing, which the S13 clients do row-wise off-engine). from_json
    // keeps extraction inside codegen; no UDF, no driver parsing.
    "f14_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType))))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // Z1: Morton/z-order curve values over (user_id, ts_ns) — the
    // data-layout operator (storage.ZOrder) whose integer quantize +
    // bit-interleave the oracle reproduces exactly. The layout itself
    // (zorderWrite) is exercised by ZOrderSpec's per-file bounding-box
    // assertions; this row pins the curve arithmetic.
    "z1_zorder_curve" -> ((s, dir) =>
      graft.storage.ZOrder.withZValue(
          Tables.events(s, dir).select("event_id", "user_id", "ts_ns"),
          Seq("user_id", "ts_ns"), bits = 8)
        .select(col("event_id"), col("__z").as("zval"))
        .orderBy("event_id"))
  )

  /** Unrolled Morton interleave for the z1 oracle: bit j of `qi` lands
    * at position 2j+i, mirroring [[graft.storage.ZOrder.interleave]].
    */
  private def zInterleaveSql(q0: String, q1: String, bits: Int): String =
    (0 until bits).flatMap(j => Seq(
      s"((($q0 >> $j) & 1) << ${2 * j})",
      s"((($q1 >> $j) & 1) << ${2 * j + 1})")).mkString(" + ")

  def oracles: Map[String, String] = Map(
    "s13_provider_ingest" ->
      """WITH g AS (SELECT unnest(range(0, 1000)) AS i),
        |bars AS (
        |  SELECT 'TEST' AS symbol,
        |         i * 60000000000 AS ts_ns,
        |         (10000 + (i * 37) % 5000) / 100.0 AS close,
        |         (i * 7919) % 997 + 1 AS volume
        |  FROM g)
        |SELECT symbol, count(*) AS n_bars,
        |       CAST(sum(volume) AS BIGINT) AS total_volume,
        |       min(ts_ns) AS first_ts, max(ts_ns) AS last_ts,
        |       CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) AS sum_close
        |FROM bars GROUP BY symbol ORDER BY symbol""".stripMargin,
    "s4_append_dedup" ->
      s"""${BarQueries.barsCte},
         |incoming AS (
         |  SELECT symbol, ts_ns, open, high, low, close * 2.0 AS close, volume
         |  FROM bars WHERE volume % 2 = 0),
         |u AS (
         |  SELECT symbol, ts_ns, open, high, low, close, volume, 0 AS seq FROM bars
         |  UNION ALL
         |  SELECT symbol, ts_ns, open, high, low, close, volume, 1 AS seq FROM incoming)
         |SELECT symbol, ts_ns, open, high, low, close, volume FROM (
         |  SELECT *, row_number() OVER (PARTITION BY symbol, ts_ns ORDER BY seq DESC) AS rn
         |  FROM u)
         |WHERE rn = 1 ORDER BY symbol, ts_ns""".stripMargin,
    "a3_partial_trade_count" ->
      """SELECT l_orderkey,
        |  CAST(CASE WHEN count(tc) = count(*) THEN sum(tc) END AS BIGINT) AS trade_count,
        |  count(*) AS n
        |FROM (SELECT *, CAST(CASE WHEN l_linenumber <= 4 THEN l_linenumber END AS BIGINT) AS tc
        |      FROM lineitem)
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "a7_metrics_avg" ->
      """SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_value,
        |       count(*) AS n
        |FROM events
        |WHERE event_type = 'click' AND epoch_ns(ts) >= 1705000000000000000""".stripMargin,
    "a9_null_ratio" ->
      """SELECT
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS null_ratio_priority,
        |  CAST(sum(CASE WHEN maybe_null IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS null_ratio_bigprice
        |FROM (SELECT *, CASE WHEN o_totalprice <= 100000.0 THEN o_totalprice END AS maybe_null
        |      FROM orders)""".stripMargin,
    "f3_time_convert" ->
      """SELECT event_id, epoch_ns(ts) AS ts_ns, CAST(ts AS DATE) AS d,
        |       hour(ts) AS h, minute(ts) AS m,
        |       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_sec
        |FROM events ORDER BY event_id""".stripMargin,
    "f14_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "z1_zorder_curve" ->
      s"""WITH mm AS (
         |  SELECT min(user_id) AS a0, max(user_id) AS b0,
         |         min(epoch_ns(ts)) AS a1, max(epoch_ns(ts)) AS b1
         |  FROM events),
         |q AS (
         |  -- HUGEINT-widened product: the 128-bit twin of the engine's
         |  -- DECIMAL(38,0) intermediate (exact for ranges beyond BIGINT/255)
         |  SELECT event_id,
         |    CASE WHEN b0 > a0 THEN CAST(
         |      ((CAST(user_id AS HUGEINT) - a0) * 255) // (CAST(b0 AS HUGEINT) - a0)
         |      AS BIGINT) ELSE 0 END AS q0,
         |    CASE WHEN b1 > a1 THEN CAST(
         |      ((CAST(epoch_ns(ts) AS HUGEINT) - a1) * 255) // (CAST(b1 AS HUGEINT) - a1)
         |      AS BIGINT) ELSE 0 END AS q1
         |  FROM events, mm)
         |SELECT event_id, CAST(${zInterleaveSql("q0", "q1", 8)} AS BIGINT) AS zval
         |FROM q ORDER BY event_id""".stripMargin
  )
}
