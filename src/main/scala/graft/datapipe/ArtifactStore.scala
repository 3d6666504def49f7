package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once persisted artifacts — the idempotent-artifact discipline
  * the reference applies to its aggregate outputs (ref
  * `src/marketpipe/aggregation/infrastructure/duckdb_engine.py:110-117`:
  * write once, later consumers read the files) generalized to any
  * expensive intermediate several queries share.
  *
  * The motivating case is the near-dup PAIR GRAPH: component clustering,
  * canonical-survivor keep, graph centrality, and the leakage-safe
  * train/holdout split all consume the same LSH candidate pairs. Without
  * an artifact each consumer re-runs the whole
  * shingle→minhash→band→bucket-join pipeline (or nondeterministically
  * hits Spark's CacheManager via a shared frontier fragment — warm-cache
  * bench numbers that a fresh session does not reproduce). With it, the
  * graph is computed ONCE per corpus snapshot, written as parquet, and
  * every consumer starts from a file scan: cold-start cost is paid
  * exactly once, visibly, by the builder.
  *
  * At 100 TB this is not an optimization but the only sane shape: a pair
  * graph over a trillion-document corpus is hours of cluster time, and
  * the downstream consumers (clustering, ranking, splitting) are
  * re-run far more often than the corpus changes. The artifact lives on
  * the cluster FS (`spark.graft.materialize.scratchDir` when set — the
  * same production contract as [[graft.core.Materialize.frontier]]),
  * keyed by a caller-supplied corpus-identity string; local runs fall
  * back to a per-JVM temp dir. Registration is per-JVM: a new driver
  * re-builds rather than trusting files an older code version wrote
  * (artifact staleness is a silent-wrong-answer class; rebuild is merely
  * slow).
  *
  * Thread-safe: concurrent callers for one key block on the single
  * build; distinct keys build independently.
  */
object ArtifactStore {

  // key -> parquet path, registered only after a successful write
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)
  private lazy val localRoot =
    java.nio.file.Files.createTempDirectory("graft_artifacts").toString

  private def rootFor(spark: SparkSession): String =
    spark.conf.getOption(graft.core.Materialize.ScratchDirConf)
      .filter(_.nonEmpty)
      .map(dir => s"$dir/${spark.sparkContext.applicationId}_artifacts")
      .getOrElse(localRoot)

  /** The artifact for `key`: first caller evaluates `build` and writes
    * it as zstd parquet; every later caller (any query in the same
    * session) reads the files back. Returns a plain parquet scan —
    * downstream plans prune/push down into it like any table.
    */
  def getOrBuild(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val path = built.computeIfAbsent(key, { _ =>
      val p = s"${rootFor(spark)}/a${seq.incrementAndGet()}_" +
        key.replaceAll("[^A-Za-z0-9_.-]", "_").take(80)
      build.write.mode("overwrite").option("compression", "zstd").parquet(p)
      p
    })
    spark.read.parquet(path)
  }

  /** Bucketed variant: the artifact is written with `bucketBy` (via
    * `saveAsTable` — bucket metadata lives in the session catalog) so
    * joins keyed on `bucketCol` read the stored side exchange-free
    * (the [[graft.storage.ParquetStore.writeBucketed]] contract;
    * BucketedJoinSpec pins the no-shuffle plan). The shape for
    * INDEX-like artifacts consumed by repeated keyed joins — an LSH
    * band index probed by every incoming batch wants its (band, bucket)
    * shuffle paid once at build, not per probe.
    */
  def getOrBuildBucketed(spark: SparkSession, key: String, bucketCol: String,
                         nBuckets: Int)(build: => DataFrame): DataFrame = {
    val table = built.computeIfAbsent(key, { _ =>
      // jvmTag makes the table LOCATION unique per JVM: the catalog is
      // in-memory (fresh each session) but the warehouse directory is
      // not, and CREATE ... AS SELECT refuses a non-empty leftover
      // location from an earlier session (observed as a silent -1 bench
      // row). A fresh name per JVM cannot collide with any leftover.
      val t = "graft_artifact_" +
        key.replaceAll("[^A-Za-z0-9_]", "_").take(60).toLowerCase(java.util.Locale.ROOT) +
        s"_${jvmTag}_${seq.incrementAndGet()}"
      build.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").bucketBy(nBuckets, bucketCol).saveAsTable(t)
      t
    })
    spark.table(table)
  }

  /** Number of artifacts this JVM has built (spec hook). */
  def builtCount: Int = built.size()

  /** Drop the per-JVM registry (spec hook; files are left for the temp
    * reaper — a dropped key simply rebuilds).
    */
  def reset(): Unit = built.clear()
}
