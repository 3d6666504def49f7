package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Execution-shape evidence for optimization claims that explain() cannot
  * show (eagerly-materialized iterative operators, write workloads): runs
  * each named SparkEntry query twice (first execution discarded — codegen
  * / first-listing noise) and prints the SECOND execution's Spark job
  * count, stage count and task count. Fewer jobs/stages at identical
  * results is the checkable artifact for "removed an exchange / removed a
  * pass" claims in OPTIMIZATION_r*.md.
  */
object CountJobs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    def exec(q: String): Unit = {
      graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    args.foreach { q =>
      exec(q) // warm: codegen + first file listings
      // listener events are async; settle before zeroing the counters
      Thread.sleep(500)
      jobs.set(0); stages.set(0); tasks.set(0)
      exec(q)
      Thread.sleep(500)
      println(s"COUNT $q jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    spark.stop()
  }
}
