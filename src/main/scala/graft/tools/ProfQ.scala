package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Generic per-query profiler (dev harness, not library surface): runs
  * named SparkEntry queries N times with Bench's cold-row hygiene and
  * prints, per run, (a) job count, (b) per-stage wall / task-CPU /
  * input / shuffle / spill / peak-memory, and (c) the executed plan's
  * per-node SQL metrics (rows in/out of each aggregate, spill sizes,
  * build times) — the attribution evidence SCALE.md entries cite.
  *
  * Usage: runMain graft.tools.ProfQ <query> [nRuns]
  * Env: SPARK_GRAFT_SF_DIR (default bench_data/sf10).
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfQ <queryName>[,<queryName>...] [nRuns]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val nRuns = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf10")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    // the noop write runs its OWN QueryExecution — the df's is never
    // executed, so its plan metrics stay empty; capture the executed one
    @volatile var lastQe: Option[org.apache.spark.sql.execution.QueryExecution] = None
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        lastQe = Some(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        stages.add(
          f"  stage ${si.stageId}%4d ${si.name.take(52)}%-52s wall=$wall%7.2fs " +
          f"task=${tm.executorRunTime / 1e3}%8.1fs cpu=${tm.executorCpuTime / 1e9}%8.1fs " +
          f"in=${tm.inputMetrics.bytesRead / 1e6}%8.1fMB/${tm.inputMetrics.recordsRead}%10d " +
          f"shR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spill=${(tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6}%8.1fMB " +
          f"peak=${tm.peakExecutionMemory / 1e6}%7.1fMB tasks=${si.numTasks}%3d")
      }
    })

    // the executed plan with runtime SQL metrics, AQE final plans included
    def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
      val m = p.metrics.toSeq
        .filter { case (_, v) => v.value != 0 && v.value != -1 }
        .sortBy(_._1)
        .map { case (k, v) => s"$k=${v.value}" }.mkString(" ")
      out.append("  " + "  " * depth + p.nodeName + (if (m.nonEmpty) s" [$m]" else "") + "\n")
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(qs.plan)
        case other => other.children
      }
      kids.foreach(walk(_, depth + 1, out))
    }

    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // warmup like Bench: JVM/codegen, not the per-query work
    spark.range(1000000L).selectExpr("sum(id)").collect()

    names.foreach { q =>
      (1 to nRuns).foreach { i =>
        dropBlocks(); stages.clear(); jobs.set(0)
        Thread.sleep(300)
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // let stage-completed events drain
        println(f"PROFQ $q run$i total=$secs%.2fs jobs=${jobs.get()}")
        stages.forEach(println(_))
        if (i == nRuns) { // plan metrics from the last (warmest) run
          lastQe.foreach { qe =>
            val sb = new StringBuilder
            walk(qe.executedPlan, 0, sb)
            println(s"PROFQ $q plan-with-metrics (run$i):\n$sb")
          }
        }
      }
    }
    spark.stop()
  }
}
