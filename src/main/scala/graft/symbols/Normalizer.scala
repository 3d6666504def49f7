package graft.symbols

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symbol-snapshot normalizer: natural-key construction, duplicate
  * resolution, surrogate-ID assignment.
  * (ref: src/marketpipe/ingestion/normalizer/symbol_normalizer.sql:24-82)
  */
object Normalizer {

  /** natural_key = COALESCE(figi, ticker || '|' || exchange_mic)
    * (ref: symbol_normalizer.sql:29,33)
    */
  def withNaturalKey(snapshot: DataFrame): DataFrame =
    snapshot.withColumn(
      "natural_key",
      coalesce(col("figi"), concat_ws("|", col("ticker"), col("exchange_mic"))))

  /** W1: keep one row per natural_key — latest as_of, tie-break provider
    * ASC (ref: symbol_normalizer.sql:25-44).
    */
  def dedup(snapshot: DataFrame): DataFrame = {
    val w = Window.partitionBy("natural_key")
      .orderBy(col("as_of").desc, col("provider").asc)
    snapshot
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Identifier validity columns over a staged SymbolRecord frame: format
    * AND check-digit validation for figi/cusip/isin, digits-only cik,
    * 4-char MIC (see [[Identifiers]]). Invalid identifiers are nulled (the
    * reference raises per-record; columnar validation nulls + flags so one
    * bad row cannot fail a 10^9-row batch).
    */
  def withIdentifierValidity(snapshot: DataFrame): DataFrame = {
    // native codegen'd check-digit expressions (one char loop per
    // identifier; IdentifiersNativeSpec pins them verdict-equal to the
    // declarative Identifiers twins)
    graft.functions.GraftFunctions.register(snapshot.sparkSession)
    snapshot
      .withColumn("figi_valid", col("figi").isNotNull &&
        Identifiers.figiValidNative(col("figi")))
      .withColumn("cusip_valid", col("cusip").isNotNull &&
        Identifiers.cusipValidNative(col("cusip")))
      .withColumn("isin_valid", col("isin").isNotNull &&
        Identifiers.isinValidNative(col("isin")))
      .withColumn("cik_valid", col("cik").isNotNull && Identifiers.cikValid(col("cik")))
      .withColumn("mic_valid", Identifiers.micValid(col("exchange_mic")))
      .withColumn("figi", when(col("figi_valid"), col("figi")))
      .withColumn("cusip", when(col("cusip_valid"), col("cusip")))
      .withColumn("isin", when(col("isin_valid"), col("isin")))
      .withColumn("cik", when(col("cik_valid"), Identifiers.cikNormalize(col("cik"))))
  }

  /** Dimension-size bound (optimizer estimate, bytes) under which
    * [[assignIds]] keeps the simple global-window form; above it the
    * scalable twin runs automatically. 64 MiB default: a one-task sort
    * over that much dimension data is cheaper than the range-partition
    * job the scalable path adds.
    */
  val AssignIdsLocalMaxBytesConf = "spark.graft.assignIds.localMaxBytes"
  val DefaultAssignIdsLocalMaxBytes: Long = 64L << 20

  /** W2: dense surrogate IDs ordered by natural_key, stable across reruns;
    * `offset` shifts new inserts past the current max id
    * (ref: symbol_normalizer.sql:46-82; scd_writer.py:94-112).
    *
    * Size-dispatching (SURVEY §7.4.7): a global row_number is a
    * single-partition window — fine for small dimensions, a one-task
    * bottleneck for a 100M-row one — so above
    * [[AssignIdsLocalMaxBytesConf]] (optimizer size estimate) this
    * routes to [[assignIdsScalable]] automatically. Both paths produce
    * IDENTICAL ids (the global rank of the unique natural_key;
    * NormalizerSpec pins equality), so the dispatch is invisible to
    * callers.
    */
  def assignIds(deduped: DataFrame, offset: Long = 0L): DataFrame = {
    val threshold = deduped.sparkSession.conf
      .getOption(AssignIdsLocalMaxBytesConf).flatMap(_.toLongOption)
      .getOrElse(DefaultAssignIdsLocalMaxBytes)
    if (graft.core.Materialize.estimateBytes(deduped) <= threshold)
      deduped.withColumn(
        "id",
        row_number().over(Window.orderBy("natural_key")).cast("long") + offset)
    else assignIdsScalable(deduped, offset)
  }

  /** [[assignIds]] without the single-partition window: range-partition by
    * natural_key (globally ordered partitions), sort within each, then
    * `zipWithIndex` — a per-partition count job plus index arithmetic, no
    * stage ever sees more than one partition's rows. Ids are identical to
    * [[assignIds]] (global rank of the unique natural_key), whatever
    * bounds the range sampler picks. The one RDD drop in the library:
    * assigning a global dense sequence IS per-partition imperative logic.
    */
  def assignIdsScalable(deduped: DataFrame, offset: Long = 0L,
                        numPartitions: Int = 0): DataFrame = {
    val spark = deduped.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val sorted = deduped
      .repartitionByRange(parts, col("natural_key"))
      .sortWithinPartitions("natural_key")
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "id", org.apache.spark.sql.types.LongType, nullable = false))
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(withIdx, schema)
  }
}
