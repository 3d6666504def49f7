package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datapipe.{Dedup, TextAnalysis}
import graft.core.{Materialize, Parallelism}

/** Experiment harness for d2_ngram_jaccard's memory budget (r13): is the
  * pair-array frontier (write + read-back of the O(Σdf²) arrays) needed
  * at all, and do `first(size)` agg buffers lose to size-in-group-key?
  * Variants (all must produce identical results):
  *   A current operator
  *   B no pair-array frontier (explode the arrays lazily)
  *   C B + sizes in the group key instead of first() buffers
  * Prints per-variant wall time + result checksum. Not library surface.
  */
object ProfD2Alt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf1")
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(bit_xor(xxhash64(
        col("id_a"), col("id_b"), col("n_common"), col("size_a"),
        col("size_b"))), lit(0L))).first()
      (r.getLong(0), r.getLong(1))
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    val n = 3; val threshold = 0.5; val maxDocsPerShingle = 1000

    // shared posting build (identical to the operator's)
    def postings(): DataFrame =
      Materialize.frontier(Dedup.shingleArrays(docs, n))
        .withColumn("set_size", size(col("shingles")))
        .select(col("doc_id"), col("set_size"), explode(col("shingles")).as("shingle"))
        .groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id").as("id"),
          col("set_size")))).as("docs"))
        .where(size(col("docs")).between(2, maxDocsPerShingle))

    def pairArraysOf(p: DataFrame): DataFrame =
      p.select(flatten(
        transform(col("docs"), (x, i) =>
          transform(slice(col("docs"), i + 2, size(col("docs"))),
            y => struct(
              x.getField("id").as("id_a"), y.getField("id").as("id_b"),
              x.getField("set_size").as("size_a"), y.getField("set_size").as("size_b")))))
        .as("pairs"))

    def finish(pairs: DataFrame): DataFrame =
      pairs.groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_common"),
          first(col("size_a")).as("size_a"), first(col("size_b")).as("size_b"))
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("size_a") + col("size_b") - col("n_common")).cast("double"))
        .where(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("n_common"),
          col("size_a").cast("long").as("size_a"),
          col("size_b").cast("long").as("size_b"), col("jaccard"))

    def finishKeyed(pairs: DataFrame): DataFrame =
      pairs.groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("size_a") + col("size_b") - col("n_common")).cast("double"))
        .where(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("n_common"),
          col("size_a").cast("long").as("size_a"),
          col("size_b").cast("long").as("size_b"), col("jaccard"))

    def variantA(): DataFrame =
      Dedup.ngramJaccardPairs(docs, n, threshold, maxDocsPerShingle)
    def variantB(): DataFrame =
      finish(pairArraysOf(postings()).select(explode(col("pairs")).as("p")).select("p.*"))
    def variantC(): DataFrame =
      finishKeyed(pairArraysOf(postings()).select(explode(col("pairs")).as("p")).select("p.*"))

    val order = sys.env.getOrElse("PROFD2_ORDER", "A,B,C").split(",")
    val variants = Map("A" -> (() => variantA()), "B" -> (() => variantB()),
      "C" -> (() => variantC()))
    order.foreach { tag =>
      dropBlocks(); Thread.sleep(300)
      try {
        val ((cnt, x), secs) = time(checksum(variants(tag)()))
        println(f"PROFD2 $tag n=$cnt%d xor=$x%d t=$secs%.2fs")
      } catch { case e: Throwable =>
        println(s"PROFD2 $tag FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
        if (spark.sparkContext.isStopped) return
      }
    }
    spark.stop()
  }

}
