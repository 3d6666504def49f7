package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    // default; read it as a raw ns long (consulted at scan planning, so a
    // runtime set is effective)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with both a ns long (`ts_ns`, truncated to µs precision to
    * match engines whose TIMESTAMP is µs, e.g. the DuckDB oracle) and a
    * proper timestamp column (`ts`).
    *
    * The driver's parquet has shipped `ts` as TIMESTAMP(NANOS) (loaded as
    * a raw ns long under `nanosAsLong=true`) in some generations and as
    * `timestamp[us]` (loaded as TIMESTAMP_NTZ) in others — dispatch on the
    * loaded dtype so both keep working.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // legacy ns-as-long: truncate to µs precision, derive timestamp.
        // `div` (integer division), NOT `/`: Column./ is double division,
        // and ns epoch values (~1.7e18) exceed double's 53-bit mantissa,
        // so the truncating cast back to long can land 1 µs low.
        raw
          .withColumn("ts_ns", (col("ts") - (col("ts") % 1000L)).cast("long"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // session tz is UTC everywhere in this project, so NTZ→TZ cast is
        // value-preserving; keep `ts` as TimestampType for downstream parity
        raw
          .withColumn("ts_ns",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
          .withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected long ns, " +
            "timestamp, or timestamp_ntz)")
    }
  }

  /** Register every table as a temp view so spark.sql can use the same
    * table names as the DuckDB oracle.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
