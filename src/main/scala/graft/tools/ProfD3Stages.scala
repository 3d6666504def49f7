package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.{Dedup, TextAnalysis}

/** Dev profiling harness attributing d3/d12-builder cost to its stages:
  * fixture construction, shingle arrays, native md5 signatures, band
  * hashing, and the (band,bucket) self-join. Not part of the library
  * surface; mirrors DataPipeQueries.docsWithNearDups exactly.
  */
object ProfD3Stages {
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(100000L).selectExpr("sum(id)").collect()
    for (i <- 1 to 2) {
      time(s"fixture_$i") { noop(docsWithNearDups) }
      time(s"shingles_$i") { noop(Dedup.shingleArrays(docsWithNearDups)) }
      time(s"signatures_$i") {
        noop(Dedup.minhashSignaturesPortable(docsWithNearDups, k = 16))
      }
      time(s"bands_$i") {
        noop(Dedup.minhashBandsPortable(docsWithNearDups, k = 16, bands = 4))
      }
      time(s"pairs_$i") {
        noop(Dedup.minhashLshCandidatesPortable(docsWithNearDups, k = 16, bands = 4))
      }
    }
    spark.stop()
  }
}
