package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.Dedup
import graft.storage.ParquetStore
object DriveBucketed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("wh").toString)
      .config("spark.sql.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val store = new ParquetStore(spark, "/tmp/unused_root")
    val facts = (1 to 50000).map(i => (i.toLong % 1000, i.toLong)).toDF("k", "v")
    val dims = (1 to 5000).map(i => (i.toLong % 1000, s"d$i")).toDF("k", "d")
    store.writeBucketed(facts, "drv_facts", "k", 16, sortCol = Some("k"))
    store.writeBucketed(dims, "drv_dims", "k", 16, sortCol = Some("k"))
    val j = spark.table("drv_facts").join(spark.table("drv_dims"), "k")
    val exchanges = j.queryExecution.executedPlan.toString.split("\n").count(_.contains("Exchange"))
    println(s"DRIVE bucketed join exchanges=$exchanges rows=${j.count()}")
    // near-dup keep through the public API on real testdata
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mutated = docs.where(col("doc_id") < 10)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    val all = docs.unionByName(mutated)
    val pairs = Dedup.ngramJaccardPairs(all, 3, 0.5)
    val kept = Dedup.nearDupKeep(all, pairs)
    println(s"DRIVE neardup total=${all.count()} pairs=${pairs.count()} kept=${kept.count()} (expect kept = total - 10)")
    spark.stop()
  }
}
