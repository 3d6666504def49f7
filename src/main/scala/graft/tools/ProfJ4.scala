package graft.tools

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** j4_range_join mid-scale recovery harness (r17 VERDICT item 3): the r17
  * as-of rewrite killed the sf100 cliff (spill 10 GB -> 0) but runs ~2x
  * slower at sf10 than the r16 interval join. Candidate plans, timed with
  * Bench's noop-sink + block hygiene:
  *
  *   asof   — the shipped plan (AsofJoin union + one window pass);
  *   arr    — per-key sorted version ARRAYS: versions collapse to one
  *            array row per custkey (collect_list, dimension-scale), the
  *            probe side joins on custkey alone (single-key sort instead
  *            of the union window's (k, ts, tag, payload-fields) sort)
  *            and each probe picks its version with a codegen'd
  *            array_max(filter(...)) over the ~|orders|/|customers|-entry
  *            array — zero row expansion, same tie-break algebra
  *            (struct(ts, version_key) max == greatest valid_from, then
  *            greatest version_key — the non-empty-interval winner);
  *   arrAgg — arr, with probes pre-aggregated to distinct (k, ts) + count
  *            before the join (shuffle fewer rows; sum counts after).
  *
  * Equivalence of every variant is asserted against the shipped plan's
  * rows at the end (collect + compare — run at sf0.1/sf10 scale only).
  *
  * Usage: SPARK_GRAFT_SF_DIR=bench_data/sf10 runMain graft.tools.ProfJ4 [nRuns]
  * Env: SPARK_GRAFT_PREFER_SMJ=false to let the planner pick shuffled hash.
  */
object ProfJ4 {
  def main(args: Array[String]): Unit = {
    val nRuns = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (scala.util.Try(cpus.trim.toInt).getOrElse(32) * 8).toString)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf10")

    def versions = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("version_key"))
    def probes = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
      .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("k"), col("l_shipdate").as("pts"))

    def asof: DataFrame =
      graft.joins.AsofJoin.asofJoin(
          probes.withColumnRenamed("pts", "ts"), versions,
          on = "ts", by = Seq("k"), rightCols = Seq("version_key"))
        .where(col("version_key").isNotNull)
        .groupBy("version_key").agg(count(lit(1)).as("n_lineitems"))
        .orderBy("version_key")

    def varr = versions
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("ts"), col("version_key"))))
        .as("vs"))

    def arr: DataFrame =
      probes.join(varr, Seq("k"))
        .select(expr("array_max(filter(vs, v -> v.ts <= pts))").as("m"))
        .where(col("m").isNotNull)
        .groupBy(col("m.version_key").as("version_key"))
        .agg(count(lit(1)).as("n_lineitems"))
        .orderBy("version_key")

    def arrAgg: DataFrame =
      probes.groupBy("k", "pts").agg(count(lit(1)).as("__n"))
        .join(varr, Seq("k"))
        .select(expr("array_max(filter(vs, v -> v.ts <= pts))").as("m"), col("__n"))
        .where(col("m").isNotNull)
        .groupBy(col("m.version_key").as("version_key"))
        .agg(sum(col("__n")).as("n_lineitems"))
        .orderBy("version_key")

    // the r16 interval plan (equi-join on custkey + range post-filter)
    def interval: DataFrame = {
      val iv = versions
        .withColumnRenamed("k", "v_custkey")
        .withColumnRenamed("ts", "valid_from")
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("v_custkey").orderBy(col("valid_from"), col("version_key"))))
      probes.join(iv,
          col("k") === col("v_custkey") &&
            col("pts") >= col("valid_from") &&
            (col("valid_to").isNull || col("pts") < col("valid_to")))
        .groupBy("version_key").agg(count(lit(1)).as("n_lineitems"))
        .orderBy("version_key")
    }

    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 } finally dropBlocks()
    }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }

    val variants: Seq[(String, () => DataFrame)] =
      Seq("asof" -> (() => asof), "interval" -> (() => interval),
        "arr" -> (() => arr), "arrAgg" -> (() => arrAgg))
    variants.foreach { case (_, mk) => time(exec(mk())) } // warm JIT/codegen
    variants.foreach { case (n, mk) =>
      val runs = Seq.fill(nRuns)(time(exec(mk())))
      println(f"PROFJ4 $n%-8s med=${med(runs)}%7.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    // equivalence: bit-exact rows against the shipped plan
    val ref = asof.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Seq("interval" -> interval, "arr" -> arr, "arrAgg" -> arrAgg).foreach { case (n, df) =>
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      println(s"PROFJ4 equiv $n = ${got == ref} (${got.size} rows)")
    }
    spark.stop()
  }
}
