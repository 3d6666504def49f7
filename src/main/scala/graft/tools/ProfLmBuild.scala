package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: is the sf10 lm_model_artifact build genuinely slower
  * after TextStats, or is it the first-query JIT-warmup cliff (the
  * d13 finding)? Runs a quality-summary pass first (warms the
  * TextStats/annotate code paths), then times the train lineage the
  * builder row executes. Not part of the library surface.
  */
object ProfLmBuild {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf10")
    def docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (sys.env.get("SPARK_GRAFT_WARMUP").contains("1"))
      time("warmup_t8_summary") {
        graft.datapipe.QualityRules.summary(docs)
          .write.mode("overwrite").format("noop").save()
      }
    import graft.datapipe.QualityRules
    time("annotate_project_only") {
      QualityRules.annotate(docs)
        .select(col("doc_id"), col("text"), size(col("failed_rules")).as("nf"))
        .write.mode("overwrite").format("noop").save()
    }
    // the unfenced control: predicate pushdown substitutes the alias
    // chain and plants one TextStats copy per metric reference into the
    // filter (683.9 s at sf10 vs 4.0 s for the same lineage as a
    // projection and 14.5 s for the fenced fit_counts). Opt-in — it
    // costs ~11 min per run.
    if (sys.env.get("SPARK_GRAFT_CONTROL").contains("1"))
      time("annotate_then_unfenced_where") {
        QualityRules.annotate(docs)
          .where(size(col("failed_rules")) === 0)
          .select(col("doc_id"), col("text"))
          .write.mode("overwrite").format("noop").save()
      }
    time("annotate_then_fenced_where") {
      QualityRules.kept(docs)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").format("noop").save()
    }
    time("fit_counts") {
      val (uni, bi) = graft.datapipe.LanguageModel.fitCounts(docs)
      uni.write.mode("overwrite").format("noop").save()
      bi.write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
