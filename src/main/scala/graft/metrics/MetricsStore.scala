package graft.metrics

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Metrics store: append-only (ts, name, value, provider, feed) table with
  * windowed average and bucketed-trend queries.
  * (ref: src/marketpipe/metrics.py:131-256)
  */
final class MetricsStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def record(rows: Seq[(Long, String, Double, String, String)]): Unit =
    rows.toDF("ts", "name", "value", "provider", "feed")
      .write.mode(SaveMode.Append).parquet(path)

  def load(): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      Seq.empty[(Long, String, Double, String, String)]
        .toDF("ts", "name", "value", "provider", "feed")
    }

  /** A7: AVG(value) WHERE name=? AND ts>=? (ref: metrics.py:201-216). */
  def windowAvg(name: String, sinceTs: Long): DataFrame =
    load().where(col("name") === name && col("ts") >= sinceTs)
      .agg(avg("value").as("avg_value"), count(lit(1)).as("n"))

  /** A8: trend over the trailing 24h in `buckets` equal time buckets:
    * per bucket AVG(value), COUNT(*) (ref: metrics.py:218-248).
    */
  def trend(name: String, nowTs: Long, buckets: Int = 24): DataFrame = {
    val width = 86400L / buckets
    val start = nowTs - 86400L
    load()
      .where(col("name") === name && col("ts") >= start && col("ts") < nowTs)
      .groupBy((floor((col("ts") - start) / width)).cast("int").as("bucket"))
      .agg(avg("value").as("avg_value"), count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** A12: distinct metric names (ref: metrics.py:250-255). */
  def names(): DataFrame = load().select("name").distinct().orderBy("name")

  /** Dashboard-style per-metric summary: samples, avg/min/max and the
    * latest value+ts (ref: cli/metrics_info.py info surface).
    */
  def summary(): DataFrame =
    load()
      .groupBy("name")
      .agg(
        count(lit(1)).as("n"),
        avg("value").as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        max_by(col("value"), col("ts")).as("latest_value"),
        max("ts").as("latest_ts"))
      .orderBy("name")

  /** One-shot dashboard rollup (the data surface of the reference's live
    * metrics dashboard, ref: cli/metrics_dashboard.py:97-200 — per metric
    * AND per provider/feed: sample count, avg/min/max, latest value).
    * Rendering is the CLI's job; this is one grouped-aggregate pass.
    */
  def dashboard(): DataFrame =
    load()
      .groupBy("name", "provider", "feed")
      .agg(
        count(lit(1)).as("n"),
        avg("value").as("avg_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        max_by(col("value"), col("ts")).as("latest_value"),
        max("ts").as("latest_ts"))
      .orderBy("name", "provider", "feed")

  /** Prometheus text exposition of the latest value per
    * (name, provider, feed) — the scrape surface of the reference's
    * metrics server (ref: metrics_server.py:147,286-293), produced from
    * the store instead of an in-process registry. Metadata-scale driver
    * formatting; timestamps are emitted in milliseconds per the format.
    */
  def prometheusText(prefix: String = "graft_"): String = {
    val rows = dashboard().collect()
    val sb = new StringBuilder
    // group by the SANITIZED metric name: distinct raw names that sanitize
    // to one identifier must share a single # TYPE block (scrapers reject
    // duplicate TYPE lines for the same metric)
    rows.groupBy(r =>
        prefix + MetricsStore.sanitizeName(r.getAs[String]("name")))
      .toSeq.sortBy(_._1).foreach { case (metric, group) =>
        sb.append(s"# TYPE $metric gauge\n")
        // raw names that merged into one sanitized metric can collide on
        // (provider, feed) — emitting both would be two samples with
        // identical name+labels, which fails the WHOLE scrape. Keep the
        // freshest (latest_ts, then value for a total order) per label set.
        group.groupBy(r => (r.getAs[String]("provider"), r.getAs[String]("feed")))
          .values.map(_.maxBy(r =>
            (r.getAs[Long]("latest_ts"), r.getAs[Double]("latest_value"))))
          .toSeq
          .sortBy(r => (r.getAs[String]("provider"), r.getAs[String]("feed")))
          .foreach { r =>
            val prov = MetricsStore.escapeLabel(r.getAs[String]("provider"))
            val feed = MetricsStore.escapeLabel(r.getAs[String]("feed"))
            val labels = s"""provider="$prov",feed="$feed""""
            sb.append(s"$metric{$labels} ${r.getAs[Double]("latest_value")} " +
              s"${r.getAs[Long]("latest_ts") * 1000L}\n")
          }
    }
    sb.result()
  }
}

object MetricsStore {
  /** Prometheus metric-name sanitization: [a-zA-Z0-9_:] only. */
  def sanitizeName(name: String): String =
    name.replaceAll("[^a-zA-Z0-9_:]", "_")

  /** Label-value escaping per the text exposition format: backslash,
    * double-quote, and line-feed must be escaped or the exposition is
    * invalid (ref: metrics_server.py exposition surface).
    */
  def escapeLabel(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
}
