package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion job state machine + repository.
  * (ref: src/marketpipe/ingestion/domain/entities.py:20-27,141-457)
  *
  * States: PENDING -> IN_PROGRESS -> COMPLETED | FAILED | CANCELLED.
  * Driver-side metadata at dimension scale; persisted as a small Parquet
  * state table (idempotent overwrite per update batch).
  */
object JobState {
  val Pending = "PENDING"
  val InProgress = "IN_PROGRESS"
  val Completed = "COMPLETED"
  val Failed = "FAILED"
  val Cancelled = "CANCELLED"

  /** Legal transitions (ref: entities.py state machine). */
  val transitions: Map[String, Set[String]] = Map(
    Pending -> Set(InProgress, Cancelled),
    InProgress -> Set(Completed, Failed, Cancelled),
    Completed -> Set.empty, Failed -> Set.empty, Cancelled -> Set.empty)

  def canTransition(from: String, to: String): Boolean =
    transitions.getOrElse(from, Set.empty).contains(to)

  def isTerminal(state: String): Boolean =
    state == Completed || state == Failed || state == Cancelled
}

final case class Job(
    job_id: String,
    symbol: String,
    day: String, // YYYY-MM-DD
    state: String,
    created_at: Long, // epoch seconds
    updated_at: Long)

/** Append-log job repository: every save/transition appends one row with a
  * monotonically increasing `seq`; reads resolve latest-wins per job_id.
  * No read-modify-write of the whole table — concurrent jobs appending
  * their own updates cannot lose each other's writes, and a transition is
  * O(1 append + 1 point lookup) instead of O(all jobs). `compact()`
  * folds the log down to its latest view via append-snapshot-then-delete,
  * so a crash or a concurrent appender never loses records (see its
  * scaladoc); only retention (`keep`) semantics assume a single
  * maintenance writer.
  */
final class JobRepo(spark: SparkSession, path: String,
                    autoCompactFiles: Int = 64) {
  import spark.implicits._

  private def raw(): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      Seq.empty[Job].toDF().withColumn("seq", lit(0L))
    }

  /** Latest-wins fold (one row per job_id) over a (pre-filtered) log. */
  private def latest(r: DataFrame): DataFrame =
    r.groupBy("job_id")
      .agg(max_by(
        struct(r.columns.filterNot(_ == "job_id").map(col).toSeq: _*),
        col("seq")).as("j"))
      .select(col("job_id") +: r.columns.filterNot(c => c == "job_id" || c == "seq")
        .map(c => col(s"j.$c")).toSeq: _*)

  /** Latest-wins view of the log (one row per job_id). */
  def load(): DataFrame = latest(raw())

  private def fs(): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logFiles(): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs()
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
  }

  // cached log-file count so routine appends don't issue a listStatus RPC
  // per transition; seeded lazily, then maintained incrementally (appends
  // +1, compact re-seeds) and re-synced from a real listing every 16th
  // append — the cache only sees THIS instance's appends, so under
  // concurrent writers it drifts in both directions; the periodic re-list
  // bounds that drift to 16 files while keeping the steady-state RPC cost
  // at 1/16 per transition. -1 = not yet seeded.
  private var fileCountCache: Int = -1
  private var appendsSinceList: Int = 0

  private def append(jobs: Seq[Job]): Unit = {
    jobs.toDF().withColumn("seq", lit(JobRepo.nextSeq()))
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
    // each append adds one file; fold the log back to one when it crowds
    // so per-read cost stays bounded between explicit compact() calls
    if (autoCompactFiles > 0) {
      appendsSinceList += 1
      if (fileCountCache < 0 || appendsSinceList >= 16) {
        fileCountCache = logFiles().size
        appendsSinceList = 0
      } else fileCountCache += 1
      if (fileCountCache > autoCompactFiles) compact()
    }
  }

  def save(jobs: Seq[Job]): Unit = append(jobs)

  /** Point lookup: the job_id filter lands BEFORE the latest-wins fold —
    * it reaches the parquet scan as a pushed filter, so transition-path
    * appends (single-job files) are skipped via footer min/max stats
    * instead of being read and folded whole.
    */
  def get(jobId: String): Option[Job] =
    latest(raw().where(col("job_id") === jobId)).as[Job].collect().headOption

  def transition(jobId: String, to: String, now: Long): Unit = {
    val j = get(jobId).getOrElse(
      throw new IllegalArgumentException(s"unknown job $jobId"))
    require(JobState.canTransition(j.state, to),
      s"illegal transition ${j.state} -> $to for $jobId")
    append(Seq(j.copy(state = to, updated_at = now)))
  }

  /** A14: job-state histogram (ref: cli/jobs.py:163-168). */
  def histogram(): DataFrame =
    load().groupBy("state").count().orderBy("state")

  /** Rewrite the append log as its latest-wins view, keeping only jobs
    * matching `keep` — the metadata half of retention pruning (ref:
    * cli/prune.py:228-330). Returns rows dropped.
    *
    * Crash/concurrency shape: APPEND a latest-wins snapshot, THEN delete
    * the pre-snapshot files — never a read-then-overwrite. Each snapshot
    * row carries its ORIGINAL seq, so compaction is invisible to
    * latest-wins folding: a snapshot row ties only with the identical row
    * it copied, and any concurrent append necessarily carries a newer seq
    * for its job and outranks the snapshot (a fresh snapshot seq would
    * shadow appends that landed during the read-write window). The old
    * files are listed BEFORE the read, so a file landing mid-compaction
    * is either read into the snapshot and deleted (rows survive in the
    * snapshot) or not in the delete list and survives as-is. A crash
    * between snapshot append and deletes leaves duplicate identical rows,
    * which folding resolves. Retention semantics (`keep`) still assume a
    * single maintenance writer: a concurrent append can legitimately
    * resurrect a job this call is pruning.
    */
  def compact(keep: Job => Boolean = _ => true): Long = {
    val before = logFiles() // list FIRST — see scaladoc
    val r = raw()
    val others = r.columns.filterNot(_ == "job_id")
    val latestDf = r.groupBy("job_id")
      .agg(max_by(struct(others.map(col).toSeq: _*), col("seq")).as("j"))
      .select(col("job_id") +: others.map(c => col(s"j.$c")).toSeq: _*)
    val rows = latestDf.collect()
    def toJob(row: org.apache.spark.sql.Row) = Job(
      row.getAs[String]("job_id"), row.getAs[String]("symbol"),
      row.getAs[String]("day"), row.getAs[String]("state"),
      row.getAs[Long]("created_at"), row.getAs[Long]("updated_at"))
    val kept = rows.filter(row => keep(toJob(row)))
    spark.createDataFrame(java.util.Arrays.asList(kept: _*), latestDf.schema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)
    val f = fs()
    before.foreach(p => f.delete(p, false))
    fileCountCache = logFiles().size
    rows.length - kept.length
  }

  /** Drop terminal jobs not updated since `cutoffEpochSec` (jobs cleanup). */
  def cleanupTerminal(cutoffEpochSec: Long): Long =
    compact(j => !(JobState.isTerminal(j.state) && j.updated_at < cutoffEpochSec))

  /** Drop terminal jobs whose data day precedes `cutoffDay` (YYYY-MM-DD) —
    * pairs with partition pruning of the same cutoff.
    */
  def pruneByDay(cutoffDay: String): Long =
    compact(j => !(JobState.isTerminal(j.state) && j.day < cutoffDay))
}

object JobRepo {
  // wall-clock-anchored strictly increasing sequence: survives JVM
  // restarts (nanoTime does not — it can reset below older entries and
  // make latest-wins return stale rows) while staying unique within a
  // process even for appends in the same microsecond
  private val seqGen = new java.util.concurrent.atomic.AtomicLong(0L)
  private[jobs] def nextSeq(): Long =
    seqGen.updateAndGet(prev =>
      math.max(prev + 1, System.currentTimeMillis() * 1000000L))
}

/** Per-symbol ingestion checkpoints = last processed ts_ns
  * (ref: ingestion/application/services.py:470-552). Batch analogue of a
  * Structured Streaming checkpoint: consulted to window the next fetch;
  * stale or beyond-job-range checkpoints are discarded (restart from job
  * start).
  */
final class Checkpoints(spark: SparkSession, path: String) {
  import spark.implicits._

  def load(): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      Seq.empty[(String, Long)].toDF("symbol", "last_ts_ns")
    }

  def save(cp: DataFrame): Unit =
    cp.select("symbol", "last_ts_ns")
      // coalesce, not repartition: these are dimension-scale metadata
      // rows — a single narrow task writes them without the exchange a
      // repartition(1) inserts (one fewer stage per save/append)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Resume point for a job window [startNs, endNs): checkpoint + 1 bar if
    * valid, else job start (ref: services.py:476-491 validation).
    */
  def resumeFrom(symbol: String, startNs: Long, endNs: Long, barNs: Long = 60000000000L): Long = {
    val row = load().where(col("symbol") === symbol).select("last_ts_ns").collect()
    row.headOption.map(_.getLong(0)) match {
      case Some(ts) if ts >= startNs && ts < endNs => ts + barNs
      case _ => startNs
    }
  }
}
