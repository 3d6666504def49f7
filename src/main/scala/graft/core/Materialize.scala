package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.storage.StorageLevel

/** Handle to one materialized frontier: the re-usable DataFrame plus a
  * deterministic [[release]] that frees whatever storage backs it —
  * localCheckpoint executor blocks, DISK_ONLY_2 persisted blocks, or
  * scratch-dir parquet files. Without an explicit release those live
  * until driver GC + the async ContextCleaner get around to them (or JVM
  * shutdown for scratch files) — measured in the Bench harness as 2-5×
  * tail-row slowdowns across a 164-row sweep from dead blocks squeezing
  * execution memory, and unbounded for a long-lived streaming driver.
  *
  * Contract: release ONLY after every consumer of [[df]] has run its
  * last action. The localCheckpoint variant has truncated lineage, so a
  * released frontier cannot recompute — a post-release action fails.
  * `release()` is idempotent and never throws on I/O (best-effort file
  * delete, non-blocking unpersist).
  */
final class Frontier private[core] (val df: DataFrame, releaseFn: () => Unit) {
  private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
  def release(): Unit = if (released.compareAndSet(false, true)) releaseFn()
  def isReleased: Boolean = released.get()
}

/** Scope that tracks [[Frontier]]s and frees them all on [[close]] — the
  * deterministic-lifecycle wrapper library callers compose long-lived
  * drivers with:
  *
  * {{{
  * Materialize.withFrontiers { scope =>
  *   val (curated, counts) = Curate.run(docs, cfg, scope = Some(scope))
  *   curated.write.parquet(out)   // last consumer runs inside the scope
  * }                              // close(): all blocks/scratch freed
  * }}}
  *
  * Iterative operators ([[graft.datapipe.Dedup.duplicateComponentsRounds]],
  * [[graft.datapipe.GraphRank.pageRankMicro]]) additionally release each
  * round's frontier as soon as the next round is materialized, so peak
  * storage is one round's working set, not the whole iteration history.
  */
final class FrontierScope extends AutoCloseable {
  private val handles = scala.collection.mutable.ArrayBuffer.empty[Frontier]
  /** Register an externally-created handle for release at close. */
  def track(h: Frontier): Frontier = synchronized { handles += h; h }
  def frontier(df: DataFrame): DataFrame = frontierHandle(df).df
  def frontierHandle(df: DataFrame): Frontier =
    track(Materialize.frontierHandle(df))
  def frontierObserved(df: DataFrame, metrics: Column*): (Frontier, Map[String, Any]) = {
    val (h, m) = Materialize.frontierObserved(df, metrics: _*)
    track(h); (h, m)
  }
  /** Release every tracked frontier (idempotent per handle). */
  def close(): Unit = synchronized { handles.foreach(_.release()); handles.clear() }
}

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
  *
  * Scratch hygiene: frontier tables are written under a per-application
  * subdirectory `<scratchDir>/<applicationId>_<uuid>/frontier_N`, so two
  * concurrent applications (or a restarted driver reusing a counter)
  * sharing one scratch dir can never clobber each other's live frontier.
  * Every subdir this JVM creates is tracked and deleted on JVM shutdown;
  * call [[cleanupScratch]] to reclaim the space earlier (only after all
  * frames read from it have been fully consumed — the returned DataFrame
  * lazily re-reads those files).
  */
object Materialize {

  val LocalMaxBytesConf = "spark.graft.materialize.localMaxBytes"
  val ScratchDirConf = "spark.graft.materialize.scratchDir"
  val DefaultLocalMaxBytes: Long = 8L << 30

  private val scratchSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  // one collision-free namespace per JVM even if applicationId repeats
  // across driver restarts (local mode reuses "local-<ts>" shapes)
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  // (scratch subdir path, hadoop conf) pairs created by this JVM — the
  // hadoop conf is captured at write time so the shutdown hook can build
  // a FileSystem without a live SparkContext
  private val createdDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[
      (String, org.apache.hadoop.conf.Configuration)]()
  private val hookRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Optimizer size estimate in bytes (may be a loose upper bound). */
  def estimateBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when re-evaluating the frame costs ~one scan: the optimized
    * plan is a leaf (parquet/local relation), optionally under
    * attribute-only projections and cheap row-local filters. Such frames
    * gain nothing from a frontier (the "materialization" would write the
    * same bytes a re-scan reads) — [[frontierHandleIfExpensive]] skips
    * them. Deliberately conservative: any join/aggregate/generate/window,
    * or any non-trivial projection expression (tokenizers, hashes,
    * higher-order functions) fails the test, because re-evaluating those
    * per consumer is exactly what frontiers exist to prevent.
    */
  def isReusableScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    def cheapExpr(e: Expression): Boolean = e match {
      case _: Attribute | _: Literal => true
      case a: Alias => cheapExpr(a.child)
      case c: Cast => cheapExpr(c.child)
      case b: BinaryComparison => b.children.forall(cheapExpr)
      case i: In => i.children.forall(cheapExpr)
      case And(l, r) => cheapExpr(l) && cheapExpr(r)
      case Or(l, r) => cheapExpr(l) && cheapExpr(r)
      case Not(c) => cheapExpr(c)
      case _: IsNull | _: IsNotNull => e.children.forall(cheapExpr)
      case _ => false
    }
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case Project(exprs, child) => exprs.forall(cheapExpr) && scanShaped(child)
      case Filter(cond, child) => cheapExpr(cond) && scanShaped(child)
      case l: LeafNode => l.getClass.getSimpleName != "CommandResult"
      case _ => false
    }
    scanShaped(df.queryExecution.optimizedPlan)
  }

  /** [[frontierHandle]], except scan-shaped inputs ([[isReusableScan]])
    * are returned as-is under a no-op handle: consumers re-read the
    * (already stored) source instead of paying a materialization job +
    * storage for bytes that exist on disk. The artifact-read fast path
    * for operators whose input is "usually an expensive pipeline, but
    * sometimes a stored table".
    */
  def frontierHandleIfExpensive(df: DataFrame): Frontier =
    if (isReusableScan(df)) new Frontier(df, () => ())
    else frontierHandle(df)

  /** Delete every scratch subdirectory this JVM has written. Safe to call
    * repeatedly; only call once frames returned by [[frontier]] are fully
    * consumed (they lazily re-read the scratch files).
    */
  def cleanupScratch(): Unit = {
    val it = createdDirs.iterator()
    while (it.hasNext) {
      val (dir, conf) = it.next()
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(conf).delete(p, true)
      } catch { case _: java.io.IOException => () } // best-effort
      it.remove()
    }
  }

  private def ensureShutdownHook(): Unit =
    if (hookRegistered.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupScratch()))
    }

  /** Reap scratch frontier directories whose modification time is older
    * than `cutoffMillis` (epoch ms) under this session's configured
    * scratch dir. The shutdown hook only covers JVMs that SHUT DOWN — a
    * long-running streaming driver never reaches it, and crashed
    * applications never do, so a shared scratch dir accumulates dead
    * frontiers without periodic reaping. Age, not ownership, is the
    * contract: a streaming driver's own day-old frontiers are long
    * consumed (frontiers live for one composition, not one application),
    * and another app's live frontiers are younger than any sane cutoff.
    * Emptied per-application namespaces are removed with their last
    * frontier. Returns the number of frontier dirs deleted.
    *
    * For `30d`-style age expressions, see `graft.jobs.Prune.reapScratch`
    * (the retention-pruning parser composed with this primitive).
    */
  def reapScratch(spark: org.apache.spark.sql.SparkSession,
                  cutoffMillis: Long): Long = {
    spark.conf.getOption(ScratchDirConf).filter(_.nonEmpty) match {
      case None => 0L
      case Some(dir) =>
        val conf = spark.sparkContext.hadoopConfiguration
        val root = new org.apache.hadoop.fs.Path(dir)
        val fs = root.getFileSystem(conf)
        if (!fs.exists(root)) return 0L
        var deleted = 0L
        fs.listStatus(root).filter(_.isDirectory).foreach { app =>
          fs.listStatus(app.getPath).filter(_.isDirectory).foreach { fr =>
            if (fr.getModificationTime < cutoffMillis &&
                fs.delete(fr.getPath, true)) deleted += 1
          }
          if (fs.listStatus(app.getPath).isEmpty &&
              app.getModificationTime < cutoffMillis)
            fs.delete(app.getPath, true)
        }
        deleted
    }
  }

  /** Materialize with GC-managed lifetime (the round-10 behavior):
    * blocks are freed when the frame is collected and the async
    * ContextCleaner runs. Prefer [[frontierHandle]] / [[FrontierScope]]
    * when the caller knows the last consumer — deterministic release
    * keeps a long-lived driver's storage bounded.
    */
  def frontier(df: DataFrame): DataFrame = frontierHandle(df).df

  /** Materialize and return a [[Frontier]] handle whose `release()`
    * deterministically frees the backing storage.
    */
  def frontierHandle(df: DataFrame): Frontier = {
    val conf = df.sparkSession.conf
    val threshold = conf.getOption(LocalMaxBytesConf)
      .flatMap(_.toLongOption).getOrElse(DefaultLocalMaxBytes)
    if (estimateBytes(df) <= threshold) {
      val cp = df.localCheckpoint()
      // the checkpointed Dataset's plan is a LogicalRDD over the persisted
      // (lineage-truncated) RDD; unpersisting that RDD IS the release
      val rdds = cp.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      new Frontier(cp, () => rdds.foreach(_.unpersist(blocking = false)))
    } else conf.getOption(ScratchDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val appDir = s"$dir/${sc.applicationId}_$jvmTag"
        val path = s"$appDir/frontier_${scratchSeq.incrementAndGet()}"
        df.write.mode("overwrite").option("compression", "zstd").parquet(path)
        createdDirs.add((appDir, sc.hadoopConfiguration))
        ensureShutdownHook()
        val hconf = sc.hadoopConfiguration
        new Frontier(df.sparkSession.read.parquet(path), () => {
          try {
            val p = new org.apache.hadoop.fs.Path(path)
            p.getFileSystem(hconf).delete(p, true)
          } catch { case _: java.io.IOException => () } // best-effort
        })
      case None =>
        val p = df.persist(StorageLevel.DISK_ONLY_2)
        p.count()
        new Frontier(p, () => { p.unpersist(blocking = false); () })
    }
  }

  /** Materialize AND compute aggregate metrics over the full frame in
    * the SAME job, via `Dataset.observe`: the localCheckpoint /
    * parquet-write / persist-count action that materializes the frontier
    * also fires the observation, so iterative operators that need a
    * per-round signature (e.g. the star-contraction fixpoint test in
    * [[graft.datapipe.Dedup.duplicateComponentsRounds]]) pay ONE job per
    * round instead of materialize + separate aggregate scan.
    *
    * `metrics` must be aggregate expressions valid under `observe` (no
    * distinct aggregates). Returns the handle plus the observed values
    * keyed by their aliases.
    */
  def frontierObserved(df: DataFrame, metrics: Column*): (Frontier, Map[String, Any]) = {
    require(metrics.nonEmpty, "frontierObserved needs at least one metric")
    val obs = new Observation(
      "graft_frontier_" + java.util.UUID.randomUUID().toString.take(12))
    val h = frontierHandle(df.observe(obs, metrics.head, metrics.tail: _*))
    (h, obs.get)
  }

  val SortFrontierConf = "spark.graft.sortFrontier.enabled"

  /** Frontier-before-declared-ORDER-BY, suite-wide (guide §2.4/§5; r17
    * VERDICT item 1 — the general form of the d17 fix): a global sort
    * executes its child once for the range-partitioner's sampling pass and
    * once for the real output pass, so every declared deterministic
    * ORDER BY re-runs its pipeline's final (post-last-exchange) stage as
    * pure measurement-shaped waste — d17 alone re-ran a 5.4 GB/6.5 GB-spill
    * aggregation for a 4.7 MB result (133 s at sf100). This helper LAZILY
    * persists the pre-sort child when — and only when — it carries real
    * final-stage computation ([[PlanShim.cheapToRescan]] skips
    * scan-/union-/repartition-shaped children, where the sample pass costs
    * one re-read of already-stored bytes and a cache would just copy
    * them). Lazy persist, NOT an eager localCheckpoint: the sampling pass
    * itself populates the cache (RangePartitioner.sketch scans every
    * child partition in full), so the child executes exactly once with
    * ZERO added jobs — an eager materialization job was measured as a net
    * +27 s across the sf0.1 sweep, its fixed job cost swamping the saved
    * re-execution on sub-second rows. Rows, order, schema identical by
    * construction; the oracle hash-compare pins it per query.
    *
    * DEFAULT OFF (`spark.graft.sortFrontier.enabled=true` opts a session
    * in). Measured verdict, r18: the suite-wide rewrite LOSES — sf0.1
    * +27 s (eager) / +68 s (lazy persist without AQE-in-cache) / ~neutral
    * (persist + canChangeCachedPlanOutputPartitioning=true), sf10 net
    * +35–67 s, because the heaviest rows' pre-sort outputs (d2 pair
    * table, j4 per-version counts) cost more to build as columnar cache
    * batches than their final-stage re-execution costs, while the rows
    * that win save only fractions of a second. The sample-pass tax is
    * real but is the FINAL post-shuffle stage only; where that stage is
    * catastrophic the fix belongs at the specific row (d17's explicit
    * frontier, r17 §8). Kept as an opt-in for such cases and for the
    * committed A/B evidence (bench_out/r18_ab/, OPTIMIZATION_r18.md
    * §1).
    */
  def frontierBeforeSort(df: DataFrame): DataFrame =
    if (!df.sparkSession.conf.getOption(SortFrontierConf).exists(_.toBoolean)) df
    else org.apache.spark.sql.graftshim.PlanShim.frontierTopSort(
      df,
      p => !org.apache.spark.sql.graftshim.PlanShim.cheapToRescan(p),
      child => child.persist(StorageLevel.MEMORY_AND_DISK))

  /** Run `f` with a fresh [[FrontierScope]]; every frontier materialized
    * through the scope is released when `f` returns (or throws). The
    * last action on any frame derived from a scoped frontier must run
    * INSIDE `f`.
    */
  def withFrontiers[T](f: FrontierScope => T): T = {
    val scope = new FrontierScope
    try f(scope) finally scope.close()
  }
}
