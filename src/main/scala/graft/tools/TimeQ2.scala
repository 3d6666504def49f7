package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe._
import graft.queries.DataPipeQueries
object TimeQ2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEQ2 $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("docs")(docs.count())
    t("tokens")(docs.select(TextAnalysis.tokens(col("text")).as("t")).select(sum(size(col("t")))).first().getLong(0))
    t("shingleArrays")(Dedup.shingleArrays(docs).count())
    t("shingleArrays_sum")(Dedup.shingleArrays(docs).select(sum(size(col("shingles")))).first().getLong(0))
    t("shingles_explode")(Dedup.shingles(docs).count())
    t("postings")(Dedup.ngramJaccardPairs(docs, 3, 0.5).count())
    spark.stop()
  }
}
object TimeQ3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEQ3 $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val arr = Dedup.shingleArrays(docs)
    t("explode_plain")(arr.select(col("doc_id"), explode(col("shingles"))).count())
    val barrier = arr.withColumn("_b", monotonically_increasing_id())
    t("explode_barrier")(barrier.select(col("doc_id"), explode(col("shingles"))).count())
  }
}
object TimeQ4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEQ4 $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val arr = Dedup.shingleArrays(docs)
    t("explode_after_shuffle")(arr.repartition(32).select(col("doc_id"), explode(col("shingles"))).count())
    t("docs_repart_first")(Dedup.shingleArrays(docs.repartition(32)).select(col("doc_id"), explode(col("shingles"))).count())
    println("partitions of docs scan: " + docs.rdd.getNumPartitions)
  }
}
object TimeQ5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEQ5 $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val n = 3
    val tok = TextAnalysis.tokens(col("text"))
    val withBarrier = docs
      .select(col("doc_id"), tok.as("toks"), monotonically_increasing_id().as("_b"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k + 1)): _*))).as("shingles"))
    t("barrier_tokens_explode")(withBarrier.select(col("doc_id"), explode(col("shingles"))).count())
  }
}
object TimeQ6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEQ6 $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val arr = Dedup.shingleArrays(docs.repartition(32)).cache()
    t("materialize")(arr.count())
    t("explode_cached")(arr.select(col("doc_id"), explode(col("shingles"))).count())
    t("full_jaccard_cached_input")({
      val postings = arr
        .withColumn("set_size", size(col("shingles")))
        .select(col("doc_id"), col("set_size"), explode(col("shingles")).as("shingle"))
        .groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"), col("set_size")))).as("docs"))
        .where(size(col("docs")).between(2, 1000))
      postings.count()
    })
  }
}
object TimeQ7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEQ7 $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    t("hash_repart")(Dedup.shingleArrays(docs).repartition(32, col("doc_id"))
      .select(col("doc_id"), explode(col("shingles"))).count())
    t("local_checkpoint")(Dedup.shingleArrays(docs).localCheckpoint()
      .select(col("doc_id"), explode(col("shingles"))).count())
  }
}
object DriveNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // Skew.saltedJoin at the package boundary
    val large = (1 to 100000).map(i => (if (i % 5 == 0) "HOT" else s"k${i % 1000}", i)).toDF("key", "v")
    val small = Seq(("HOT", 1.0), ("k1", 2.0)).toDF("key", "w")
    val plain = large.join(small, Seq("key")).count()
    val salted = Skew.saltedJoin(large, small, "key", salts = 16).count()
    println(s"DRIVE salted=$salted plain=$plain match=${salted == plain}")
    // PagedProviderSource at the package boundary
    import graft.sources.PagedProviderSource._
    val pages = Iterator.tabulate(5)(p => (0 until 100).map(i =>
      ProviderRecord("aapl", Some(1000000000L * (p * 100 + i)), Some(1.0), Some(2.0),
        Some(0.5), Some(1.5), if (i % 10 == 0) None else Some(10L))))
    val bars = toBars(spark, pages)
    println(s"DRIVE provider bars=${bars.count()} (expect 450 = 500 - 50 invalid)")
    spark.stop()
  }
}
