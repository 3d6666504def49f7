package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale joins and aggregations.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting is still the right tool when one side has a handful of hot keys
  * and the other side is small enough to replicate per salt.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a salt in [0, salts);
    * the small side is replicated once per salt value. The shuffle key
    * becomes (key, salt), splitting each hot key across `salts` reducers.
    * Row-multiplication happens only on the small side.
    *
    * The salt hashes the large side's non-key columns (`saltCols`,
    * default: all other columns) — the same xxhash64 scheme as
    * [[saltedAgg]], so routing is deterministic under task retries and
    * input re-partitioning (a partition-id salt routes the same row to
    * different buckets across runs; results are identical either way, but
    * deterministic placement keeps reruns and speculative tasks
    * byte-stable). Fully-duplicate rows share a salt; a hot key still
    * spreads as long as its payloads differ, which is what makes it hot.
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner",
      saltCols: Seq[String] = Nil): DataFrame = {
    val basis0 = if (saltCols.nonEmpty) saltCols
                 else large.columns.filterNot(_ == key).toSeq
    val basis = if (basis0.nonEmpty) basis0 else Seq(key)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(basis.map(col): _*), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase (partial/final) aggregation with salting for hot group
    * keys: groupBy (key, salt) first — each hot key's load is split
    * `salts` ways — then re-aggregate by key. `partialAggs` must be
    * decomposable (sum/count/min/max): the caller provides both phases.
    *
    * The salt hashes the row's non-key columns (`saltCols`, default: all
    * other columns): deterministic under task retries and input
    * reordering — a rand() salt re-rolls on retry, which is unsound for
    * anything downstream that sees the partial rows. Hashing is also
    * cheaper than drawing a random double then hashing it.
    */
  def saltedAgg(
      df: DataFrame, key: String, salts: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column],
      saltCols: Seq[String] = Nil): DataFrame = {
    val basis = if (saltCols.nonEmpty) saltCols else df.columns.filterNot(_ == key).toSeq
    df
      .withColumn("_salt", pmod(xxhash64(basis.map(col): _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
