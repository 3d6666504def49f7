package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Run-spread attribution harness (VERDICT r15 item 4): run ONE query N
  * times in a single JVM — the bench protocol's exact shape — and record,
  * per run, the wall time plus every stage's aggregate executor metrics
  * (run time, JVM GC time, shuffle write/read volume and write time, disk
  * spill, task count). The per-stage rows separate the three candidate
  * mechanisms for a run-to-run spread:
  *
  *   - GC: a slow run's stages show jvmGCTime proportionally inflated
  *     while shuffle volumes stay identical;
  *   - shuffle-write burst: the write-heavy stage's shuffleWriteTime
  *     inflates, volumes identical;
  *   - range-partitioner sampling skew: the post-sample output stage's
  *     task-time spread (max vs mean) inflates, GC flat.
  *
  * Not part of the shipped library or the driver contract — measurement
  * tooling, same class as ProfOrderBy. Emits one JSON line per run and a
  * summary line; honors the bench's block-drop + GC-settle hygiene so the
  * numbers are comparable with sweep rows.
  */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "a1_resample_5m")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf100")
    val nRuns = sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // mirror Bench's r17 scale-adaptive session config so profiles
      // explain the numbers the bench actually measures; env overrides
      // allow A/B-ing a single conf from the command line
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTS",
          (scala.util.Try(cpus.trim.toInt).getOrElse(32) * 8).toString))
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Stage(id: Int, name: String, tasks: Int,
        runMs: Long, gcMs: Long, wrMb: Double, wrTimeMs: Long,
        rdMb: Double, spillMb: Double)
    val stages = scala.collection.mutable.ArrayBuffer.empty[Stage]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += Stage(i.stageId, i.name.takeWhile(_ != '\n').take(40),
            i.numTasks, m.executorRunTime, m.jvmGCTime,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.shuffleWriteMetrics.writeTime / 1000000L, // ns -> ms
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.diskBytesSpilled / 1e6)
        }
      }
    })

    val fn = graft.SparkEntry.queries(name)
    def exec(): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    def settle(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(250)
    }
    // warmup (codegen/JIT), not recorded — mirrors the bench's session warm
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val runSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to nRuns).foreach { r =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      exec()
      val sec = (System.nanoTime() - t0) / 1e9
      runSecs += sec
      // listener bus is async; give it a moment to drain before reading
      Thread.sleep(1000)
      val snap = stages.synchronized(stages.toVector)
      val top = snap.sortBy(-_.runMs).take(8).map { s =>
        s"""{"stage":${s.id},"tasks":${s.tasks},"run_ms":${s.runMs},""" +
          s""""gc_ms":${s.gcMs},"wr_mb":${fmt(s.wrMb)},"wr_ms":${s.wrTimeMs},""" +
          s""""rd_mb":${fmt(s.rdMb)},"spill_mb":${fmt(s.spillMb)}}"""
      }.mkString("[", ",", "]")
      val gcTotal = snap.map(_.gcMs).sum
      val runTotal = snap.map(_.runMs).sum
      println(s"""{"query":"$name","run":$r,"sec":${fmt(sec)},""" +
        s""""stages":${snap.size},"exec_run_ms":$runTotal,"gc_ms":$gcTotal,""" +
        s""""wr_mb":${fmt(snap.map(_.wrMb).sum)},"wr_ms":${snap.map(_.wrTimeMs).sum},""" +
        s""""spill_mb":${fmt(snap.map(_.spillMb).sum)},"top_stages":$top}""")
      settle()
    }
    val sorted = runSecs.sorted
    println(s"""{"query":"$name","runs":${runSecs.map(fmt).mkString("[", ",", "]")},""" +
      s""""median":${fmt(sorted(sorted.size / 2))},"sf":"$sfDir"}""")
    spark.stop()
  }
}
