package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scale-aware materialization for reuse frontiers — DataFrames that are
  * (a) expensive to recompute and (b) consumed by several downstream
  * stages (or by an `explode`, whose Generate re-evaluates its generator
  * per OUTPUT row).
  *
  * Strategy by the optimizer's size estimate:
  *   - small (<= `spark.graft.materialize.localMaxBytes`, default 8 GiB):
  *     `localCheckpoint` — cheapest, GC-cleaned with the frame, but blocks
  *     live unreplicated in executor storage with TRUNCATED lineage, so a
  *     lost executor is unrecoverable. Exactly right for local/test scale
  *     and driver-adjacent metadata frames; wrong for 100 TB stages.
  *   - large, with `spark.graft.materialize.scratchDir` set: write an
  *     intermediate parquet table under the scratch dir and read it back —
  *     fully fault-tolerant (any executor can die; the files are on the
  *     cluster FS), no executor-storage pinning. The production path.
  *   - large, no scratch dir: `persist(DISK_ONLY_2)` + eager count —
  *     blocks replicated twice AND lineage retained, so a single lost
  *     executor recovers from the replica (or recomputes from lineage)
  *     instead of failing the job.
  */
object Materialize {

  val LocalMaxBytesConf = "spark.graft.materialize.localMaxBytes"
  val ScratchDirConf = "spark.graft.materialize.scratchDir"
  val DefaultLocalMaxBytes: Long = 8L << 30

  private val scratchSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Optimizer size estimate in bytes (may be a loose upper bound). */
  def estimateBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  def frontier(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val threshold = conf.getOption(LocalMaxBytesConf)
      .flatMap(_.toLongOption).getOrElse(DefaultLocalMaxBytes)
    if (estimateBytes(df) <= threshold) df.localCheckpoint()
    else conf.getOption(ScratchDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val path = s"$dir/frontier_${scratchSeq.incrementAndGet()}"
        df.write.mode("overwrite").option("compression", "zstd").parquet(path)
        df.sparkSession.read.parquet(path)
      case None =>
        val p = df.persist(StorageLevel.DISK_ONLY_2)
        p.count()
        p
    }
  }
}
