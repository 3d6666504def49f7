package graft.tools

import org.apache.spark.sql.SparkSession

/** Emits the r18 before/after physical plans for the optimization log.
  * Each "before" reconstructs the prior round's shape from the same
  * public API (or the same query with the new routing conf forced the
  * old way), so the pair is a faithful plan diff of what executed then
  * vs now. Output: plans/r18/<name>_{before,after}.txt
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans/r18")
    java.nio.file.Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dir = "/root/testdata/sf0.01"

    // ---- j4_range_join: scale-routed interval vs as-of ----
    // before (r17 shape, every scale): the as-of union + window plan.
    // after at MID scale (versions estimate <= spark.graft.j4.
    // intervalMaxBytes): the r16 interval join — measured 10.75 s vs
    // 17.48 s median same-JVM at sf10 (ProfJ4), stable 10.2-11.0 runs.
    // after at DECADE scale (> threshold): the as-of plan, unchanged —
    // sf100 keeps spill 0 / decade ratio 8.2x (r17 §7).
    spark.conf.set("spark.graft.j4.intervalMaxBytes", "0")
    dump("j4_range_join_before_asof_all_scales",
      graft.SparkEntry.queries("j4_range_join")(spark, dir))
    spark.conf.unset("spark.graft.j4.intervalMaxBytes")
    dump("j4_range_join_after_midscale_interval",
      graft.SparkEntry.queries("j4_range_join")(spark, dir))

    // ---- sort-frontier (built, measured, rebutted — §1) ----
    // The rewrite the A/B sweeps measured, on one representative row:
    // before = the shipped plan (Sort re-executes its child for the
    // range-partitioner sample); after = the opt-in rewrite (Sort over
    // the lazily-persisted child, InMemoryRelation in the plan). The
    // rebuttal kept the BEFORE shape as the default.
    dump("sortfrontier_w6_volatility_default",
      graft.SparkEntry.queries("w6_volatility")(spark, dir))
    spark.conf.set(graft.core.Materialize.SortFrontierConf, "true")
    dump("sortfrontier_w6_volatility_optin",
      graft.SparkEntry.queries("w6_volatility")(spark, dir))
    spark.conf.unset(graft.core.Materialize.SortFrontierConf)
    spark.sharedState.cacheManager.clearCache()

    // ---- AQE inside cached plans (§3) ----
    // The IngestPipeline validation context is a .cache()'d window over
    // the source; with canChangeCachedPlanOutputPartitioning=false
    // (Spark default) the cached plan's exchange is pinned at the raw
    // initialPartitionNum; with true (Bench r18) AQE coalesces it from
    // actual bytes. The conf changes runtime partition counts, not the
    // printed operator tree — evidence is the committed A/B artifacts
    // (bench_out/r18_ab/); this dump records the cached-context plan
    // shape those runs shared.
    val bars = graft.gen.SyntheticSource.bars(
      spark, Seq("AAPL"), 1704202200000000000L, 5 * 390)
    val ctx = graft.validate.RuleSet.withContext(bars).cache()
    val (clean, _) = graft.validate.RuleSet.splitCtx(ctx)
    dump("pipeline_cached_context_clean", clean)
    ctx.unpersist()

    spark.stop()
  }
}
