package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 verdict item 2: exercise Curate's opt-in near-dup auto-routing at
  * scale. Runs `Curate.run` on the given sf dir's documents twice —
  * default path (exhaustive d2 pair stage, observe-ride signal) and
  * `autoRouteNearDup = true` (pair-budget signal computed up front; d2b
  * LSH-propose + Jaccard-verify when candidate_pairs > budget) — timing
  * each end-to-end (curated count + stage table materialized), and
  * prints the stage rows including the `route:` row the routed path
  * emits. Equality of the curated (n_docs, id_sum) across paths is the
  * cheap full-corpus equivalence check (CurateSpec pins set-equality at
  * fixture scale).
  *
  * Usage: SPARK_GRAFT_SF_DIR=bench_data/sf10 SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.tools.ProfCurateRoute"
  */
object ProfCurateRoute {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def drive(tag: String, cfg: graft.datapipe.Curate.Config): Unit = {
      spark.sparkContext.setJobDescription(s"curate_route:$tag")
      val t0 = System.nanoTime()
      val (curated, counts) = graft.datapipe.Curate.run(docs, cfg)
      val sig = curated.agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("id_sum")).collect()(0)
      val stages = counts.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"ROUTE $tag%-10s t=$secs%.1f n_kept=${sig.getLong(0)} id_sum=${sig.get(1)}")
      stages.foreach(r => println(s"  stage ${r.get(0)} = ${r.get(1)}"))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // args select the paths to drive (default: both). At sf100 the
    // exhaustive default path is the Σdf² intrinsic the routing exists to
    // avoid (~10× the sf10 273.8 s) — run `autoroute` alone there; the
    // crossover evidence is the up-front pair-budget signal the routed
    // run itself prints.
    val modes = if (args.nonEmpty) args.toSeq else Seq("default", "autoroute")
    modes.foreach {
      case "default"   => drive("default", graft.datapipe.Curate.Config())
      case "autoroute" => drive("autoroute", graft.datapipe.Curate.Config(autoRouteNearDup = true))
      case other       => sys.error(s"unknown mode: $other")
    }
    spark.stop()
  }
}
