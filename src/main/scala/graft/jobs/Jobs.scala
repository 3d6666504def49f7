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
}

final case class Job(
    job_id: String,
    symbol: String,
    day: String, // YYYY-MM-DD
    state: String,
    created_at: Long, // epoch seconds
    updated_at: Long)

final class JobRepo(spark: SparkSession, path: String) {
  import spark.implicits._

  def load(): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      Seq.empty[Job].toDF()
    }

  def save(jobs: Seq[Job]): Unit = {
    val cur = load().as[Job].collect().filterNot(j => jobs.exists(_.job_id == j.job_id))
    (cur ++ jobs).toSeq.toDF()
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  def transition(jobId: String, to: String, now: Long): Unit = {
    val all = load().as[Job].collect()
    val updated = all.map {
      case j if j.job_id == jobId =>
        require(JobState.canTransition(j.state, to),
          s"illegal transition ${j.state} -> $to for $jobId")
        j.copy(state = to, updated_at = now)
      case j => j
    }
    updated.toSeq.toDF().repartition(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** A14: job-state histogram (ref: cli/jobs.py:163-168). */
  def histogram(): DataFrame =
    load().groupBy("state").count().orderBy("state")
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
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(path)

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
