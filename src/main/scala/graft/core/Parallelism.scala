package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism repair for compute-dense operators.
  *
  * Spark sizes scan splits by BYTES (`spark.sql.files.maxPartitionBytes`,
  * 128 MiB default) — the right calibration when downstream work is
  * byte-proportional. Token/shingle/hash expanders break that assumption:
  * zstd-compressed text packs ~10x, and a MinHash signature does k md5
  * calls per shingle, so one 44 MiB compressed split can hide minutes of
  * single-core work behind one task while the rest of the cluster idles.
  * (Measured: the 500k-doc sf10 corpus is a single 44 MiB parquet split;
  * its k=16 portable MinHash ran 53 s on one core of a 32-core machine —
  * the md5 work itself is ~2 s at full width.)
  *
  * [[widenForCpu]] is the repair each compute-dense operator applies to
  * its input: round-robin repartition UP to the session's shuffle
  * parallelism when the current partitioning is narrower. It never
  * contracts — a 100 TB input already wider than
  * `spark.sql.shuffle.partitions` passes through untouched, so the
  * shuffle only happens exactly when the scan was too narrow for the
  * compute that follows (and then it moves only the narrow input, which
  * is by construction small in bytes).
  *
  * Apply it to the OPERATOR'S INPUT (the raw docs frame), not mid-plan:
  * upstream of the repartition there is nothing to push down past, and
  * downstream the per-row expansion runs at full width. Streaming frames
  * pass through untouched (their parallelism comes from the source), as
  * does anything already wide enough.
  */
object Parallelism {

  /** Repartition `df` up to `spark.sql.shuffle.partitions` when its
    * physical partitioning is narrower; identity otherwise (and for
    * streaming frames). Row-level results of downstream key-based
    * operators are unchanged — only task layout moves.
    */
  def widenForCpu(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    // queryExecution.toRdd compiles (not runs) the physical plan to read
    // its partitioning. NOT Dataset.rdd: that wraps the conversion in a
    // tracked execution, firing QueryExecutionListeners with zero rows
    // flowed — which silently latches (and zeroes) any caller-attached
    // Observation upstream of this probe (bit us in Curate's
    // observed stage counts).
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
