package graft

import graft.core.FrameSpec
import graft.gen.SyntheticSource
import graft.pipeline.IngestPipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR plus
  * two pipeline workloads mirroring BASELINE.md's ingest+aggregate
  * thresholds (1 symbol x trading year; 50 symbols x single day). Prints
  * ONE JSON line: {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // comma-separated query-name subset for targeted scale rehearsals
    // (e.g. the sf10 text-operator runs): empty = the full sweep. The
    // two pipeline workloads run only when unset or explicitly listed.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    def wanted(name: String): Boolean = only.isEmpty || only(name)
    // Scale-adaptive shuffle partitioning (guide §2.2/§2.5): the final
    // partition count must come from the DATA, not a constant — 32 fixed
    // partitions at sf100 put ~600 MB of sort state in every task of the
    // heavy joins/windows (j4_range_join measured 10 GB of disk spill and
    // 124 s of GC per run). Raising only the AQE pre-coalesce ceiling to
    // 8x the core count keeps the decision adaptive: AQE's
    // parallelism-first coalescing (Spark 4 default) computes the target
    // partition size from the actual shuffle bytes at runtime, so small
    // inputs coalesce back to ~core-count partitions (the sf0.1 driver
    // bench keeps its shape) while large inputs keep enough partitions to
    // sort without spilling. Production twin: initialPartitionNum ~ a few
    // multiples of total cluster cores; the env override exists for
    // sweeps that need the r16 shape back.
    val initialParts = sys.env.get("SPARK_GRAFT_INITIAL_PARTS")
      .flatMap(_.toIntOption)
      .getOrElse(scala.util.Try(cpus.trim.toInt).getOrElse(32) * 8)
    // AQE must also size the shuffles INSIDE cached plans (r18; guide
    // §2.2): Spark pins a cached plan's output partitioning by default,
    // which left every .cache()'d subtree (the IngestPipeline validation
    // context, reAggregate's bars cache) running at the RAW
    // initialPartitionNum ceiling above — 256 tiny tasks per cached-plan
    // shuffle — instead of byte-derived counts. Measured back-to-back at
    // sf0.1: s9_report_roundtrip 1.99 -> 1.08 s, s5 1.20 -> 0.75,
    // agg_reaggregate 1.45 -> 1.05; heavy non-cached rows unchanged
    // (median-of-3 A/B committed in bench_out/r18_ab/sf10_heavy_*). Same
    // additions-only, env-overridable class as the r17 ceiling itself.
    val aqeCachedPlans = sys.env.getOrElse("SPARK_GRAFT_AQE_CACHED", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialParts.toString)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        aqeCachedPlans)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: JVM/codegen/FS-cache, not the per-query work
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.core.Tables.all.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => () }
    }
    // ... and the session's first walk through the heavy operator
    // machinery (window exec, sort-merge join, Observation frontiers,
    // TextStats/ruleset codegen, regex tokenization): measured ~10 s of
    // ONE-TIME catalyst/codegen/JIT cost on a 60-doc input — a fresh
    // session pays it on whichever TextStats-heavy row happens to run
    // first, which made that row's run1 3-4× its steady state while
    // leaving every other row untouched. Paying it here, on a fixture,
    // keeps per-row numbers about the rows (each still runs cold on its
    // own data: dropBlocks() between runs).
    locally {
      import spark.implicits._
      val tiny = (0 until 60).map(i => (i.toLong,
        s"the quick brown fox $i jumps over the lazy dog and runs to a house with many words"))
        .toDF("doc_id", "text")
      Seq(graft.datapipe.Curate.Config(),
          graft.datapipe.Curate.Config(
            qualityRuleset = Some(graft.datapipe.QualityRules.Config())))
        .foreach { cfg =>
          val (c, k) = graft.datapipe.Curate.run(tiny, cfg)
          c.agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1))).collect()
          k.collect()
        }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // Per-row block hygiene: frontier localCheckpoints (and any explicit
    // persists) hold executor storage memory until their DataFrames are
    // GC'd and the async ContextCleaner gets to them — over a 163-row
    // sweep in one 8 GiB JVM the dead blocks squeeze execution memory
    // and the tail rows measure 2-5x their isolated cost (measured r10:
    // d2 23.3 s in-sweep vs 9.3 s isolated on identical code/data).
    // Every row's inputs are rebuilt from source by construction, so
    // dropping all persisted blocks between rows is semantically free
    // and makes each measurement independent and cold — the number a
    // fresh session pays.
    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // Heap settle between measured runs (r16, closing the per-JVM
    // bimodality residual): the r15 sweep-agreement analysis isolated the
    // last disagreement mechanism as cross-row heap/GC contamination —
    // a row that runs right after a heap-heavy neighbor (d2b after d2)
    // inherits a full old gen and pays that neighbor's collection inside
    // its own measured window, and WHICH rows collide differs per JVM
    // lifetime. A forced full GC plus a short pause after every run
    // returns the heap to a common baseline so each measurement starts
    // from the same allocator state. This runs in time()'s finally,
    // AFTER the elapsed time is computed — the settle is never billed to
    // any row. Cost: ~0.1-1 s per run of unbilled wall clock.
    val gcSettleMs = sys.env.get("SPARK_GRAFT_GC_SETTLE_MS")
      .flatMap(_.toLongOption).getOrElse(250L)
    def settleHeap(): Unit = if (gcSettleMs > 0) {
      System.gc()
      Thread.sleep(gcSettleMs)
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      // a failed row must be VISIBLE (-1 in the artifact AND a stderr
      // line): the silent swallow hid a real artifact-table collision
      // for a whole run. The elapsed time is computed BEFORE the finally
      // block so the (cheap, metadata-only) block drop is not billed to
      // the row.
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        // dead-context guard (r11 postmortem): one fatal row killed the
        // SparkContext and every later row "failed" in milliseconds,
        // leaving a 65x wall of silent -1s that averaged into a
        // plausible-looking total. A stopped context means NOTHING
        // after this point can measure anything — abort the sweep
        // loudly instead of emitting garbage.
        if (spark.sparkContext.isStopped) {
          System.err.println(
            "[bench] ABORT: SparkContext is stopped — remaining rows " +
              "cannot run; no artifact written. Fix the fatal row and rerun.")
          throw new IllegalStateException("bench sweep aborted: dead SparkContext", e)
        }
        -1.0
      } finally if (!spark.sparkContext.isStopped) { dropBlocks(); settleHeap() }
    }

    // Pipeline workloads run FIRST (before the ~100-query sweep) and 3x
    // each with a fresh temp dir per run, reporting the MEDIAN: the
    // round-5 pipeline_day_50sym numbers drifted 2x across rounds purely
    // from sweep position (dead last in one shared JVM, after accumulated
    // GC/temp-FS state) — isolated repeated runs make the headline
    // BASELINE.md comparison robust to that. Individual runs are kept in
    // the artifact as _runN keys for drift diagnosis.
    // median over the SUCCESSFUL runs only (time() marks a failed run
    // -1.0): a failure must not drag the "median" down to the fastest
    // success. No successes -> -1.0; failures stay visible in the runs
    // map. ONE definition shared by the pipeline rows (fixed 3 runs,
    // the BASELINE.md comparison protocol) and the query sweep
    // (SPARK_GRAFT_RUNS) so the median-over-successes rule cannot drift.
    def medianOf(n: Int)(f: => Unit): (Double, Seq[Double]) = {
      val runs = Seq.fill(n)(time(f))
      val ok = runs.filter(_ >= 0).sorted
      (if (ok.isEmpty) -1.0 else ok(ok.size / 2), runs)
    }
    def median3(f: => Unit): (Double, Seq[Double]) = medianOf(3)(f)
    // BASELINE.md: ingest+aggregate 1 symbol x full trading year (<60s)
    val yearBars = 252 * 390
    val (pipeYear, pipeYearRuns) =
      if (!wanted("pipeline_year_1sym")) (-1.0, Nil) else median3 {
        val base = java.nio.file.Files.createTempDirectory("bench_year").toString
        val pipe = new IngestPipeline(spark, s"$base/raw", s"$base/agg", s"$base/rep")
        pipe.runJob(SyntheticSource.bars(spark, Seq("AAPL"),
          1704202200000000000L, yearBars), "bench-year")
      }
    // BASELINE.md: 50 symbols x 390-bar day (<30s)
    val (pipeDay, pipeDayRuns) =
      if (!wanted("pipeline_day_50sym")) (-1.0, Nil) else median3 {
        val base = java.nio.file.Files.createTempDirectory("bench_day").toString
        val pipe = new IngestPipeline(spark, s"$base/raw", s"$base/agg", s"$base/rep")
        val syms = (1 to 50).map(i => f"SYM$i%02d")
        pipe.runJob(SyntheticSource.bars(spark, syms,
          1704202200000000000L, 390), "bench-day")
      }

    // Position-independent sweep protocol (r15, replacing the per-row
    // variance3 allowlist that grew every round): EVERY query row is
    // median-of-N (default 3, SPARK_GRAFT_RUNS=1 for quick rehearsals).
    // Rationale: the JIT churn valley — C2 digesting the sweep's first
    // waves of generated classes — lands a 3-30x first-execution cliff
    // on whichever rows occupy early/post-change sweep positions, and
    // the victims MOVE whenever the query set or median set changes
    // (r12-r14: a19 -> a1 family -> q1/j4/lm_model_artifact). One-shot
    // rows therefore measured sweep position, not operators. Per-row
    // medians make each number the operator's steady in-sweep cost;
    // per-run values stay in the "runs" object for drift diagnosis, and
    // n_runs is recorded so artifacts are comparable across protocols.
    val nRuns = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    def medianN(f: => Unit): (Double, Seq[Double]) = medianOf(nRuns)(f)
    var extraRuns = Seq.empty[(String, Double)]
    // noop sink, not count(): count() lets Catalyst prune every unused
    // column, so a no-filter pure-projection query (fingerprints, line
    // dedup, n-gram ratios, packing) was "benchmarked" as its bare scan —
    // 0.1 s flat across scale factors, the operator itself never executed.
    // The noop write materializes every output column and row without
    // filesystem cost; aggregate/join-shaped rows measure the same work
    // as before (their plans never pruned).
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted(name) }
      .map { case (name, fn) =>
        val (med, runs) = medianN { exec(fn(spark, sfDir)) }
        if (nRuns > 1)
          extraRuns ++= runs.zipWithIndex.map { case (v, i) => s"${name}_run${i + 1}" -> v }
        name -> med
      }

    // total counts each workload once (medians), keeping the headline
    // number comparable across rounds; the _runN keys are extra detail
    val all = queryTimes ++ Seq(
      "pipeline_year_1sym" -> pipeYear, "pipeline_day_50sym" -> pipeDay)
      .filter { case (name, _) => wanted(name) }
    val runDetail =
      pipeYearRuns.zipWithIndex.map { case (v, i) => s"pipeline_year_1sym_run${i + 1}" -> v } ++
      pipeDayRuns.zipWithIndex.map { case (v, i) => s"pipeline_day_50sym_run${i + 1}" -> v } ++
      extraRuns
    // millisecond precision keeps the line short enough that log captures
    // don't truncate the tail (the full per-query map is the artifact)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // per-query map holds ONLY real workload keys (round-over-round diffs
    // iterate it); the individual pipeline repetitions live in a sibling
    // "runs" object
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    val nFailed = all.count(_._2 < 0)
    // record the JVM/config so "which sweep was this" is answerable from
    // the artifact alone (r11: a default-heap sweep was indistinguishable
    // from a 48g one after the fact)
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    // cpus comes from an env string: "*" is a valid local[*] setting but
    // interpolating it bare would emit invalid JSON — non-numeric values
    // get JSON-quoted
    val cpusJson = scala.util.Try(cpus.trim.toInt).map(_.toString)
      .getOrElse("\"" + cpus.replace("\"", "") + "\"")
    val env =
      s""""heap_gb":${fmt(heapGb)},"cpus":$cpusJson,"n_failed":$nFailed,"n_runs":$nRuns"""
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${obj(all)},"runs":${obj(runDetail)},"sf":"$sfDir","n_queries":${all.length},$env}"""
    println(json)
    // ALSO write the full JSON to a durable file: log captures have
    // truncated the stdout tail two rounds running, making the per-query
    // numbers unverifiable. Default target is bench_out/scratch/
    // (GITIGNORED): every run — builder rehearsal or driver sweep —
    // lands there, and only a deliberate `cp` promotes a blessed sweep
    // to the committed bench_out/<sf>.json. This keeps exactly one
    // unambiguous committed artifact per (sf, round) — in r12 a driver
    // re-run overwrote the builder's committed artifact in the working
    // tree and the two were only distinguishable by heap_gb.
    val outDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out/scratch")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // subset runs get their own artifact name so a targeted rehearsal
    // never clobbers the full-sweep record
    val artifact = new java.io.File(sfDir).getName +
      (if (only.nonEmpty) "_subset" else "") + ".json"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The full line above is ~10 kB at 158 queries and log captures keep
    // only a tail — r9's driver artifact had "parsed": null because the
    // line's START was cut off. Emit a COMPACT summary LAST (same schema,
    // headline queries only, ~200 chars): it always fits whole inside any
    // sane tail capture, so the driver's parser finds a valid line; the
    // per-query detail lives in the bench_out file either way.
    val headline = all.filter { case (k, _) =>
      k == "pipeline_year_1sym" || k == "pipeline_day_50sym" }
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${obj(headline)},"sf":"$sfDir","n_queries":${all.length},$env,"detail":"$outDir/$artifact"}""")
    spark.stop()
  }
}
