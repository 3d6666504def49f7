package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data-layout
  * operator behind lakehouse `OPTIMIZE ZORDER BY` (Delta/Iceberg): rows
  * are sorted along an interleaved-bit space-filling curve so that files
  * and parquet row groups get TIGHT min/max bounds on EVERY clustered
  * column simultaneously. A single-column sort gives perfect pruning on
  * that column and none on the others (full-range strips); z-ordering
  * bounds every dimension's per-file extent, so predicate pushdown skips
  * files for filters on any clustered column — at 100 TB the difference
  * between scanning one file and scanning a stripe of the whole table.
  *
  * Everything is integer arithmetic: each column is quantized to a
  * `bits`-bit cell index by exact integer scaling against its min/max
  * (`((x - min) * (2^bits - 1)) div (max - min)` — div, never double
  * division: ns-scale ranges times 255 exceed double's 53-bit mantissa;
  * the subtraction/product are widened to DECIMAL(38,0) so the 128-bit
  * intermediate is exact even when the column range itself approaches —
  * or, after subtraction of a negative min, exceeds — Long range, where
  * a bigint product would silently wrap in non-ANSI mode), then
  * bit-interleaved into the Morton code. The two min/max values per
  * column are the ONLY driver-side data (one metadata-scale aggregate,
  * the Bloom-sizing precedent); quantization and interleave stay inside
  * codegen, so the z-value — and therefore the layout — is deterministic
  * and engine-exact (the g1/quantLog discipline; the oracle reproduces
  * every z-value with the same `//` arithmetic).
  */
object ZOrder {

  /** Morton interleave of pre-quantized cell indices (each in
    * [0, 2^bits)): bit j of column i lands at position j*n + i.
    * Disjoint bit positions, so the combine is a plain sum — stays a
    * codegen'd long expression chain, no UDF.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && bits >= 1 && bits * qs.size <= 62,
      s"need 1..62 total bits, got ${qs.size} cols x $bits bits")
    (0 until bits).flatMap { j =>
      qs.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * qs.size + i)
      }
    }.reduce(_ + _)
  }

  /** `df` plus a `zCol` Morton code over `cols` (numeric, cast to long).
    * One metadata-scale min/max aggregate; constant-degenerate columns
    * (min == max) quantize to cell 0.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
                 zCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"mn_$c"),
      max(col(c).cast("long")).as(s"mx_$c")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val k = (1L << bits) - 1L
    val qs = cols.map { c =>
      val mn = mm.getAs[Long](s"mn_$c")
      val mx = mm.getAs[Long](s"mx_$c")
      if (mx > mn) {
        // range as BigInt (mx-mn can exceed Long when mn<0). Two exact
        // paths, chosen from the min/max we already hold: when the
        // (x-mn)*k product provably fits a long, plain bigint arithmetic
        // (cheapest codegen); otherwise widen to DECIMAL(38,0) so the
        // 128-bit intermediate is exact — a bigint product would wrap
        // for ranges > Long.MaxValue/k (measured ~2x decimal cost at
        // 10 M rows, so the wide path is taken only when needed).
        val range = BigInt(mx) - BigInt(mn)
        if (range <= Long.MaxValue / k)
          expr(s"((cast(`$c` as bigint) - (${mn}L)) * ${k}L) div ${range}L")
        else
          expr(s"((cast(cast(`$c` as bigint) as decimal(38,0)) - ${mn}BD) " +
            s"* ${k}BD) div ${range}BD")
      } else lit(0L)
    }
    df.withColumn(zCol, interleave(qs, bits))
  }

  /** Cluster + write: range-partition on the z-value into `numFiles`
    * files, sort within each file by it (tight row-group stats), drop
    * the helper column. Range boundaries come from Spark's reservoir
    * sample — file CONTENTS are deterministic in the curve, boundaries
    * only decide where the curve is cut.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  bits: Int = 8, numFiles: Int = 8): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
