package graft.tools

import graft.validate.RuleSet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Emits the r17 before/after physical plans for the optimization log —
  * the execution shapes explain() cannot show from the query registry
  * because the affected subtrees run INSIDE write workloads
  * (IngestPipeline.runJob) or eagerly-materialized iterations
  * (GraphRank.pageRankMicro). Each "before" is reconstructed from the
  * same public API the old code path called, so the pair is a faithful
  * plan diff of what executed then vs now.
  *
  * Output: plans/r17/<name>_{before,after}.txt
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans/r17")
    java.nio.file.Files.createDirectories(outDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // ---- pipeline errors branch (IngestPipeline.runJob) ----
    // before: runJob consumed RuleSet.split(bars)._2 == validate(bars) —
    // a SECOND window pass over a second source scan (clean was cached
    // separately). after: errors derive from the one cached context.
    val bars = graft.gen.SyntheticSource.bars(
      spark, Seq("AAPL"), 1704202200000000000L, 252 * 390)
    dump("pipeline_errors_before", RuleSet.validate(bars))
    val ctx = RuleSet.withContext(bars).cache()
    val (clean, errors) = RuleSet.splitCtx(ctx)
    // populate the cache the way runJob does (via the first pass over
    // clean) so the after-plan shows the InMemoryRelation actually hit
    clean.write.mode("overwrite").format("noop").save()
    dump("pipeline_errors_after", errors)
    ctx.unpersist()

    // ---- GraphRank.pageRankMicro iteration 1 ----
    // before: join of the degree-annotated edge table against an explicit
    // uniform rank table built via edges.select(src).distinct().
    // after: contribution read straight off the edge table (the join
    // against a constant-rank table is an algebraic no-op).
    val pairs = spark.range(0, 1000).selectExpr(
      "id as id_a", "(id * 7 + 1) % 1000 as id_b")
    val p0 = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = p0.union(p0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val edges = graft.core.Materialize.frontier(
      sym.join(sym.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src")))
    val ranks0 = edges.select(col("src").as("id")).distinct()
      .withColumn("r", lit(graft.datapipe.GraphRank.Scale))
    def iterate(contrib: org.apache.spark.sql.DataFrame) = contrib
      .groupBy("dst").agg(sum(col("c")).as("s"))
      .select(col("dst").as("id"),
        expr(s"${(graft.datapipe.GraphRank.Scale * 15L) / 100L} + (85 * s) div 100").as("r"))
    dump("g1_pagerank_iter1_before", iterate(
      edges.join(ranks0, edges("src") === ranks0("id"))
        .select(col("dst"), expr("r div deg").as("c"))))
    dump("g1_pagerank_iter1_after", iterate(
      edges.select(col("dst"), expr(s"${graft.datapipe.GraphRank.Scale} div deg").as("c"))))

    // ---- d6 decontamination: two-branch rescan vs single-pass ----
    // before (r16 shape): the broadcast contamination join `matched` was
    // consumed by TWO separate distinct-then-count branches; because the
    // join is map-side (no exchange to reuse) each branch re-tokenized and
    // re-shingled the ENTIRE corpus. after: both distinct counts come from
    // ONE collect_set aggregation — one corpus scan, one contamination-
    // proportional exchange.
    locally {
      val docs = spark.range(0, 200).selectExpr(
        "id as doc_id",
        "concat('alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi doc', id) as text")
      val bench = spark.range(0, 5).selectExpr(
        "id as bench_id",
        "'alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi' as text")
      val n = 13
      val docSh = graft.datapipe.Dedup.shingles(docs, n, "text", "doc_id")
      val benchSh = graft.datapipe.Dedup.shingles(
          bench.withColumnRenamed("text", "__btext"), n, "__btext", "bench_id")
        .withColumnRenamed("shingle", "__bshingle")
      val matched = docSh
        .join(broadcast(benchSh), col("shingle") === col("__bshingle"))
      val ngramHits = matched.select(col("doc_id"), col("shingle")).distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_matched_ngrams"))
      val benchHits = matched.select(col("doc_id"), col("bench_id")).distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_benchmarks"))
      dump("d6_decontaminate_before",
        ngramHits.join(benchHits, Seq("doc_id")).where(col("n_matched_ngrams") >= 1))
      dump("d6_decontaminate_after",
        graft.datapipe.Decontaminate.contaminated(docs, bench, n = n))
    }

    // ---- j4_range_join: interval join vs backward as-of ----
    // before (r16 shape): equi-join on custkey + range post-filter —
    // streams |versions| x |lineitems| rows per customer through the
    // filter (6.0e9 intermediate rows at sf100, 10 GB spill / 124 s GC
    // measured). after: AsofJoin union+window — one sort, zero expansion.
    locally {
      val dir = "/root/testdata/sf0.01"
      def t(n: String) = graft.core.Tables.load(spark, dir, n)
      val versionsOld = t("orders")
        .select(col("o_custkey").as("v_custkey"), col("o_orderdate").as("valid_from"),
          col("o_orderkey").as("version_key"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("v_custkey").orderBy(col("valid_from"), col("version_key"))))
      val liOld = t("lineitem")
        .join(t("orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
      dump("j4_range_join_before",
        liOld.join(versionsOld,
            col("o_custkey") === col("v_custkey") &&
            col("l_shipdate") >= col("valid_from") &&
            (col("valid_to").isNull || col("l_shipdate") < col("valid_to")))
          .groupBy("version_key")
          .agg(count(lit(1)).as("n_lineitems"))
          .orderBy("version_key"))
      dump("j4_range_join_after",
        graft.SparkEntry.queries("j4_range_join")(spark, dir))

      // ---- d17_winnow_matches: orderBy sample re-execution vs frontier ----
      dump("d17_winnow_matches_before",
        graft.datapipe.Winnowing.matches(
            graft.queries.DataPipeQueries.docsWithNearDups(spark, dir),
            k = 4, w = 4, minShared = 2, portable = true)
          .orderBy("id_a", "id_b"))
      dump("d17_winnow_matches_after",
        graft.SparkEntry.queries("d17_winnow_matches")(spark, dir))
    }

    // ---- JobRepo.append single-row metadata write ----
    // before: repartition(1) -> Exchange SinglePartition ahead of the
    // write; after: coalesce(1) — no exchange, one narrow task.
    import spark.implicits._
    val job = Seq(graft.jobs.Job("j1", "AAA", "2024-01-02", "PENDING", 1L, 1L))
      .toDF().withColumn("seq", lit(1L))
    dump("jobrepo_append_before", job.repartition(1))
    dump("jobrepo_append_after", job.coalesce(1))

    spark.stop()
  }
}
