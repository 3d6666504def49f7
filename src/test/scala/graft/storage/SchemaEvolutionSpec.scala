package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution across file generations — the reference versions its
  * bar schema (`schema/schema_v1.json` carries `schema_version`, and
  * optional columns arrive over time). A 100 TB store accretes files
  * written by different engine versions; the read path must merge them
  * without a rewrite.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema reads v1+v2 file generations; v1 rows null the new column") {
    val dir = tmpDir("evolve")
    // v1 generation: core columns only
    Seq(("AAPL", 1L, 100.0), ("MSFT", 2L, 200.0))
      .toDF("symbol", "ts_ns", "close")
      .withColumn("schema_version", lit(1))
      .write.parquet(s"$dir/gen=1")
    // v2 generation: adds an optional currency column
    Seq(("AAPL", 3L, 101.0, "USD"))
      .toDF("symbol", "ts_ns", "close", "currency")
      .withColumn("schema_version", lit(2))
      .write.parquet(s"$dir/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.contains("currency"))
    val rows = merged.orderBy("ts_ns")
      .select("ts_ns", "currency", "schema_version")
      .as[(Long, Option[String], Int)].collect()
    assert(rows === Seq((1L, None, 1), (2L, None, 1), (3L, Some("USD"), 2)))
    // version-dispatch stays a plain column predicate (prunable)
    assert(merged.where(col("schema_version") === 2).count() === 1L)
  }
}
