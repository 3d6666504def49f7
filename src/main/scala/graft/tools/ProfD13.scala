package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.SpanDedup

/** Dev profiling harness for d13_span_dedup's run-1-vs-run-2 cliff at
  * sf10 (observed: 250 s first execution, ~30 s thereafter, <5 s GC —
  * so neither data nor collector). Prints per-stage wall/task time for
  * two consecutive executions of the same plan so the slow component
  * can be attributed. Not part of the library surface.
  */
object ProfD13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf10")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        stages.add(f"stage ${si.stageId}%3d ${si.name.take(60)}%-60s wall=${wall}%7.1fs task=${cpu}%8.1fs tasks=${si.numTasks}")
      }
    })
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("d13_span_dedup")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"PROF $tag total=${(System.nanoTime() - t0) / 1e9}%.1f s")
      Thread.sleep(500)
      stages.forEach(s => println(s))
      stages.clear()
    }
    run("run1")
    run("run2")
    spark.stop()
  }
}
