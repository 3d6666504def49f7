package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.{Curate, TextAnalysis}

/** Dev harness for the curate_pipeline FIRST-RUN cliff (bench run1 is
  * 3-4× run3 on identical code/data): runs the pipeline twice in one
  * fresh JVM, optionally with whole-stage codegen disabled
  * (SPARK_GRAFT_WSCG=false), so the run1−run2 delta can be attributed —
  * if the delta collapses with codegen off, the cliff is Janino
  * compilation of the generated classes (cached by source text, so run2
  * never pays it), not interpreted-eval fallback or JIT.
  */
object ProfCurateCold {
  def main(args: Array[String]): Unit = {
    val wscg = sys.env.getOrElse("SPARK_GRAFT_WSCG", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.wholeStage", wscg)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def input = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t = TextAnalysis.tokens(col("text"))
      val mutated = d.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          array_join(slice(t, lit(1), greatest(size(t) - 5, lit(1))), " ").as("text"))
      d.unionByName(mutated).where(col("doc_id") % 4 === 0 || col("doc_id") >= 1000000000L)
    }
    spark.range(100000L).selectExpr("sum(id)").collect()
    if (sys.env.get("SPARK_GRAFT_TINY_WARM").contains("true")) {
      val t0 = System.nanoTime()
      import spark.implicits._
      val tiny = (0 until 60).map(i => (i.toLong,
        s"the quick brown fox $i jumps over the lazy dog and runs to a house with many words"))
        .toDF("doc_id", "text")
      val (c, k) = Curate.run(tiny)
      c.agg(coalesce(sum(col("doc_id")), lit(0L))).first(); k.collect()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      println(f"PROF tiny_warm ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val (curated, counts) = Curate.run(input)
      curated.agg(coalesce(sum(col("doc_id")), lit(0L))).first()
      counts.collect()
      println(f"PROF wscg=$wscg $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    run("run1"); run("run2"); run("run3")
    spark.stop()
  }
}
