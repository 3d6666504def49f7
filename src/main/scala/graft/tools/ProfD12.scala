package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.{Dedup, TextAnalysis}

/** Dev profiling harness for the d12 component queries: splits the
  * constant pair-graph (LSH) cost from the per-round star-contraction
  * cost so bench regressions can be attributed. Not part of the library
  * surface; mirrors DataPipeQueries.docsWithNearDups exactly.
  */
object ProfD12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def docsWithNearDups = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val t = TextAnalysis.tokens(col("text"))
      val mutated = d.where(col("doc_id") < 50)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          array_join(slice(t, lit(1), greatest(size(t) - 5, lit(1))), " ").as("text"))
      d.unionByName(mutated)
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(100000L).selectExpr("sum(id)").collect()
    // artifact-shaped input: pairs stored as parquet, like the bench rows
    val store = java.nio.file.Files.createTempDirectory("profd12").toString
    Dedup.minhashLshCandidatesPortable(docsWithNearDups, k = 16, bands = 4)
      .write.mode("overwrite").parquet(s"$store/pairs")
    val stored = spark.read.parquet(s"$store/pairs")
    for (i <- 1 to 3) {
      time(s"components_from_artifact_$i") {
        val (lbl, rounds) = Dedup.duplicateComponentsRounds(stored)
        lbl.write.mode("overwrite").format("noop").save()
        println(s"PROF rounds=$rounds")
      }
      time(s"component_keep_from_artifact_$i") {
        Dedup.componentKeep(docsWithNearDups, stored)
          .write.mode("overwrite").format("noop").save()
      }
    }
    for (i <- 1 to 2) {
      time(s"pairs_only_$i") {
        Dedup.minhashLshCandidatesPortable(docsWithNearDups, k = 16, bands = 4)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"components_full_$i") {
        val (lbl, rounds) = Dedup.duplicateComponentsRounds(
          Dedup.minhashLshCandidatesPortable(docsWithNearDups, k = 16, bands = 4))
        lbl.write.mode("overwrite").format("noop").save()
        println(s"PROF rounds=$rounds")
      }
    }
    spark.stop()
  }
}
