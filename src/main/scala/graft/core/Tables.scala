package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts_ns", (col("ts") - (col("ts") % 1000L)).cast("long"))
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))

  /** Register every table as a temp view so spark.sql can use the same
    * table names as the DuckDB oracle.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
