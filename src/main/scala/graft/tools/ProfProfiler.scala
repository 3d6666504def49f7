package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage breakdown for prof_column_profile at a given SF dir. */
object ProfProfiler {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf1")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $label t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val raw = graft.core.Tables.load(spark, dir, "orders").select(cols.map(col): _*)
    t("scan_count")(raw.count())
    val wide = graft.core.Parallelism.widenForCpu(raw)
    t("widen_count")(wide.count())
    t("agg_no_distinct") {
      val rest = cols.map(c => sum(col(c).isNull.cast("long"))) ++
        cols.map(c => min(col(c)).cast("string")) ++
        cols.map(c => max(col(c)).cast("string"))
      wide.agg(count(lit(1)), rest: _*).collect()
    }
    t("agg_1_distinct")(wide.agg(countDistinct(col("o_orderkey"))).collect())
    t("agg_2_distinct")(wide.agg(countDistinct(col("o_orderkey")),
      countDistinct(col("o_custkey"))).collect())
    t("agg_4_distinct")(wide.agg(countDistinct(col("o_orderkey")),
      countDistinct(col("o_custkey")), countDistinct(col("o_orderdate")),
      countDistinct(col("o_orderstatus"))).collect())
    // per-column two-phase alternative: groupBy(c) partial-dedup then 1-row agg
    t("percol_4_groupby") {
      cols.foreach { c =>
        wide.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")), count(col(c)), min(col(c)).cast("string"),
            max(col(c)).cast("string")).collect()
      }
    }
    t("split_crossjoin") {
      val rest = cols.map(c => sum(col(c).isNull.cast("long"))) ++
        cols.map(c => min(col(c)).cast("string")) ++
        cols.map(c => max(col(c)).cast("string")) ++
        Seq("o_orderkey", "o_custkey").map(c => sum(col(c).cast("decimal(28,6)")))
      val nonDist = wide.agg(count(lit(1)).as("__n"), rest: _*)
      val dist = wide.agg(countDistinct(col(cols.head)),
        cols.tail.map(c => countDistinct(col(c))): _*)
      nonDist.crossJoin(dist).collect()
    }
    t("full_profile_current")(graft.datapipe.Profiler.profile(
      graft.core.Tables.load(spark, dir, "orders"), cols,
      exactDistinct = true).collect())
    t("full_profile_again")(graft.datapipe.Profiler.profile(
      graft.core.Tables.load(spark, dir, "orders"), cols,
      exactDistinct = true).collect())
    spark.stop()
  }
}
