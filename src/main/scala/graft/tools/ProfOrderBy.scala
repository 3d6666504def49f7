package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim.PlanShim

/** Dev harness for the deterministic-ORDER-BY double-execution tax
  * (VERDICT r14 item 3): every bench/oracle query ends in a global sort,
  * and a global sort executes its child twice (range-partitioner
  * sampling pass + output pass). For each named query this times, with
  * Bench's noop-sink + block hygiene, median-of-N of:
  *   asis        — the query as benchmarked (sort included);
  *   nosort      — the pipeline with the top-level Sort stripped
  *                 (PlanShim.withoutTopSort): the operator's real cost;
  *   cksort      — localCheckpoint the pipeline, then sort the
  *                 materialized blocks (PlanShim.checkpointedSort): the
  *                 candidate harness mitigation.
  * tax = asis - nosort; the mitigation wins where cksort < asis.
  *
  * Usage: runMain graft.tools.ProfOrderBy <q1,q2,...> [nRuns]
  * Env: SPARK_GRAFT_SF_DIR (default bench_data/sf10).
  */
object ProfOrderBy {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfOrderBy <queryName>[,<queryName>...] [nRuns]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val nRuns = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf10")

    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      finally dropBlocks()
    }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }

    // one warm pass over everything so JIT churn doesn't masquerade as tax
    names.foreach { n => time(exec(graft.SparkEntry.queries(n)(spark, dir))) }

    println(f"${"query"}%-28s ${"asis"}%8s ${"nosort"}%8s ${"cksort"}%8s ${"tax"}%8s  sorted?")
    names.foreach { n =>
      val mk = () => graft.SparkEntry.queries(n)(spark, dir)
      val asis = med(Seq.fill(nRuns)(time(exec(mk()))))
      val (_, hadSort) = PlanShim.withoutTopSort(mk())
      val nosort = med(Seq.fill(nRuns)(time(exec(PlanShim.withoutTopSort(mk())._1))))
      val cksort = med(Seq.fill(nRuns)(time {
        val (df, release) = PlanShim.checkpointedSort(mk())
        try exec(df) finally release()
      }))
      println(f"$n%-28s $asis%8.2f $nosort%8.2f $cksort%8.2f ${asis - nosort}%8.2f  $hadSort")
    }
    spark.stop()
  }
}
