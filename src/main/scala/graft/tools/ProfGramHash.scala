package graft.tools

import graft.datapipe.{TextAnalysis, Winnowing}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: measured delta of the native GramHashes pass vs the
  * replaced string-building gram hashing (VERDICT r14 item 4), on the
  * two production shapes that changed:
  *   winnow  — production winnowing fingerprints (k=4, w=4): OLD =
  *             transform/array_join/xxhash64-per-gram struct array into
  *             WinnowSelect; NEW = Winnowing.fingerprints(portable=false)
  *             (GramHashes array<long> into WinnowSelect).
  *   spanocc — span-dedup k-gram occurrence postings (k=5): OLD =
  *             posexplode of the per-gram string-hash transform; NEW =
  *             SpanDedup.kgramOccurrences (GramHashes + posexplode).
  * Each timed median-of-3 after a warm pass, noop sink, block hygiene.
  *
  * Usage: runMain graft.tools.ProfGramHash [nRuns]
  * Env: SPARK_GRAFT_SF_DIR (default bench_data/sf10).
  */
object ProfGramHash {
  def main(args: Array[String]): Unit = {
    val nRuns = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf10")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    def dropBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 } finally dropBlocks()
    }
    def med(mk: () => org.apache.spark.sql.DataFrame): Double = {
      time(exec(mk())) // warm
      val s = Seq.fill(nRuns)(time(exec(mk()))).sorted
      s(s.size / 2)
    }

    // OLD production winnowing gram hashing, reconstructed verbatim
    def oldWinnow(k: Int, w: Int) = {
      val toks = TextAnalysis.tokens(col("text"))
      graft.core.Parallelism.widenForCpu(docs)
        .where(size(toks) >= k)
        .withColumn("__t", toks)
        .withColumn("__g",
          transform(sequence(lit(1), greatest(size(col("__t")) - k + 1, lit(1))), i => {
            val gram = array_join(slice(col("__t"), i, lit(k)), " ")
            struct((i - 1).cast("int").as("pos"), xxhash64(gram).as("h"))
          }))
        .withColumn("__sel", call_function(
          graft.functions.GraftFunctions.winnowSelectName, col("__g"), lit(w)))
        .select(col("doc_id"), explode_outer(col("__sel")).as("__fp"))
        .select(col("doc_id"), col("__fp.pos").cast("long").as("pos"), col("__fp.h").as("fp"))
    }
    // OLD span-dedup occurrence postings, reconstructed verbatim
    def oldSpanOcc(k: Int) = {
      val t = col("__toks")
      graft.core.Parallelism.widenForCpu(docs)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
        .where(size(t) >= k)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(t) - k),
            i => xxhash64(array_join(slice(t, i + 1, lit(k)), " ")))).as(Seq("pos", "gram_h")))
    }

    val rows = Seq(
      ("winnow_old", () => oldWinnow(4, 4)),
      ("winnow_new", () => Winnowing.fingerprints(docs, 4, 4, portable = false)),
      ("spanocc_old", () => oldSpanOcc(5)),
      ("spanocc_new", () => graft.datapipe.SpanDedup.kgramOccurrences(docs, 5)))
    println(f"${"variant"}%-14s median_s")
    rows.foreach { case (n, mk) => println(f"$n%-14s ${med(mk)}%8.2f") }
    spark.stop()
  }
}
