package graft.tools

import graft.agg.Resampler
import graft.core.FrameSpec
import graft.gen.SyntheticSource
import graft.validate.RuleSet
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the year-pipeline benchmark. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val base = java.nio.file.Files.createTempDirectory("prof").toString
    val bars = SyntheticSource.bars(spark, Seq("AAPL"), 1704202200000000000L, 252 * 390)
    t("gen_count")(bars.count())
    // mirrors IngestPipeline.runJob's r17 shape: one cached validation
    // context; the raw write fills the cache and carries the clean count
    val ctx = RuleSet.withContext(bars).cache()
    val (clean, errors) = RuleSet.splitCtx(ctx)
    val obs = new org.apache.spark.sql.Observation()
    t("raw_write_fills_cache")(new graft.storage.ParquetStore(spark, s"$base/raw")
      .write(clean.observe(obs, count(lit(1)).as("n")), FrameSpec.F1m, compactPartitions = true))
    val allFrames = FrameSpec.defaults.map { f =>
      val agg = if (f.name == "1d") Resampler.resampleDaily(clean) else Resampler.resample(clean, f)
      agg.withColumn("frame", lit(f.name))
    }.reduce(_ unionByName _)
    t("agg_write")(new graft.storage.ParquetStore(spark, s"$base/agg").writeFrames(allFrames, compactPartitions = true))
    t("errors_count")(errors.count())
    t("views")(new graft.views.ViewCatalog(spark, s"$base/agg").refreshViews())
    t("clean_count_from_obs")(obs.get("n"))
    ctx.unpersist()
    spark.stop()
  }
}
