package graft.symbols

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD-2 merge of a normalized snapshot into the symbols_master dimension.
  *
  * Semantics (ref: src/marketpipe/ingestion/normalizer/scd_writer.py:88-288
  * and src/marketpipe/ingestion/pipeline/symbol_pipeline.py:65-134):
  *  1. classify snapshot rows vs current master by natural_key:
  *     insert (new key) / update (key exists, tracked attributes changed) /
  *     unchanged;
  *  2. close current rows for updated keys (valid_to = effective_date);
  *  3. append new versions for inserts + updates (valid_from =
  *     effective_date, valid_to = NULL);
  *  4. surrogate ids: updates keep their id; inserts get max(id)+rank.
  *
  * Spark-first: one broadcast-or-shuffle full-outer join on natural_key +
  * window ranking — the dimension is small relative to facts, so at 100 TB
  * this whole pipeline is a broadcast-scale side computation.
  */
object ScdMerge {

  /** Columns compared to decide update-vs-unchanged. */
  def defaultTracked: Seq[String] = Seq("company_name", "status")

  /** Classify snapshot rows against the *current* master rows
    * (valid_to IS NULL). Returns snapshot columns + `id` (null for inserts)
    * + `action` in {insert, update, unchanged}.
    *
    * PRECONDITION: `natural_key` is unique within the snapshot and within
    * the current master — the SCD-2 contract (one version chain per key).
    * Duplicate keys multiply both this join and the close-join by the
    * duplication factor squared; dedupe upstream first
    * ([[Normalizer.dedup]] / the W1 rank step, exactly what the
    * reference's symbol_normalizer does before merging).
    */
  def classify(
      master: DataFrame,
      snapshot: DataFrame,
      tracked: Seq[String] = defaultTracked): DataFrame = {
    val curCols = Seq(col("natural_key").as("m_key"), col("id").as("m_id")) ++
      tracked.map(c => col(c).as(s"m_$c"))
    val cur = master.where(col("valid_to").isNull).select(curCols: _*)
    val changed = tracked
      .map(c => !(col(c) <=> col(s"m_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    snapshot
      .join(cur, col("natural_key") === col("m_key"), "left_outer")
      .withColumn(
        "action",
        when(col("m_key").isNull, "insert")
          .when(changed, "update")
          .otherwise("unchanged"))
      .withColumn("id", col("m_id"))
      .drop("m_key" +: "m_id" +: tracked.map(c => s"m_$c"): _*)
  }

  /** Full merge: returns the new master (same schema as `master`). */
  def merge(
      master: DataFrame,
      snapshot: DataFrame,
      effectiveDate: String,
      tracked: Seq[String] = defaultTracked): DataFrame = {
    val eff = to_date(lit(effectiveDate))
    // frontier (localCheckpoint at dimension scale, not cache): classify
    // feeds three branches below; checkpointed RDDs are GC-cleaned with
    // the DataFrame — no unpersist bookkeeping leaking across merges
    val classified = graft.core.Materialize.frontier(
      classify(master, snapshot, tracked))

    val updatedKeys = classified.where(col("action") === "update")
      .select(col("natural_key").as("u_key"))

    // J1: close current versions of updated keys (left-semi-shaped via
    // left join + flag; rewrites valid_to only on open rows)
    val closed = master
      .join(broadcast(updatedKeys), col("natural_key") === col("u_key"), "left_outer")
      .withColumn(
        "valid_to",
        when(col("u_key").isNotNull && col("valid_to").isNull, eff)
          .otherwise(col("valid_to")))
      .drop("u_key")

    // new versions: updates keep ids; inserts get max(id)+rank(natural_key)
    // via the scalable path (no single-partition window even for a huge
    // first-load snapshot)
    val maxId = master.agg(coalesce(max("id"), lit(0L))).first().getLong(0)
    val masterCols = master.columns
    val inserts = Normalizer.assignIdsScalable(
      classified.where(col("action") === "insert").drop("id"), maxId)
    val updates = classified.where(col("action") === "update")
    val newVersions = inserts.unionByName(updates, allowMissingColumns = true)
      .withColumn("valid_from", eff)
      .withColumn("valid_to", lit(null).cast("date"))
      .select(masterCols.map(col): _*)

    closed.unionByName(newVersions) // U2
  }

  /** W3: the v_symbol_latest view — latest open version per id
    * (ref: create_symbol_views.sql:27-37).
    */
  def latest(master: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy(col("valid_from").desc)
    master
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("valid_to").isNull)
      .drop("_rn")
  }

  /** S8: write the dimension partitioned by year/month of valid_from with
    * dynamic partition overwrite (ref: scd_writer.py:309-417).
    */
  def write(spark: SparkSession, master: DataFrame, path: String): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    master
      .withColumn("year", year(col("valid_from")))
      .withColumn("month", month(col("valid_from")))
      .write.mode("overwrite")
      .partitionBy("year", "month")
      .parquet(path)
  }
}
