package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.datapipe.Similarity

/** ANN recall report — the accuracy half of the speed/accuracy trade-off
  * the approximate search operators make, measured at corpus scale (sf1+,
  * not the 300-vector spec fixture) against the exact cosine top-k (sim1
  * brute force, the recall oracle). Two sections:
  *
  *   - `natural`: recall@k on the corpus as-is. The synthetic embeddings
  *     are structureless (within-label cosine ≈ across ≈ 0), so exact
  *     top-k is noise and bucketed methods are bounded by candidate
  *     coverage — reported together with the random-pick baseline
  *     (k/n), so the artifact shows LIFT over chance rather than
  *     implying broken operators.
  *   - `planted`: recall@k after planting a deterministic 10-vector
  *     jitter neighborhood around each query (cosine ≈ 0.99) — the
  *     embedding near-dup retrieval task these operators exist for.
  *     This is the number with a meaningful floor on neighborhood-free
  *     synthetic data.
  *
  * Emits ONE JSON line and writes `bench_out/recall_<tag>.json` — a
  * committed artifact, not an oracle row: recall is a corpus-dependent
  * quality metric with documented floors, not an exact value an engine
  * must reproduce. Method settings mirror the bench rows (sim2/3/5-8).
  */
object RecallReport {
  private val K = 10
  private val NQueries = 20

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench_data/sf1")
    val tag = sys.env.getOrElse("SPARK_GRAFT_TAG",
      dir.split("/").last.replaceAll("[^A-Za-z0-9._-]", "_"))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val queryIds = (0 until NQueries).map(i => i.toLong * (n / NQueries))

    // planted neighborhoods: 10 jittered copies per query vector, ids
    // 10_000_000 + qid*100 + j, each component nudged by a deterministic
    // xxhash64-derived value in [-eps, eps] (cosine vs the query ≈ 0.99)
    val eps = 0.03
    val planted = e
      .where(col("vec_id").isin(queryIds.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id").as("__q"), col("embedding").as("__e"),
        explode(sequence(lit(1), lit(K))).as("__j"))
      .select(
        (lit(10000000L) + col("__q") * 100L + col("__j")).as("vec_id"),
        zip_with(col("__e"),
          transform(sequence(lit(1), size(col("__e"))), d =>
            ((pmod(xxhash64(col("__q"), col("__j"), d), lit(2001L)) - 1000L)
              .cast("double") / 1000.0) * eps),
          (x, nz) => (x + nz).cast("float")).as("embedding"))

    def report(corpus: DataFrame): Seq[(String, Double)] = {
      val c = graft.core.Materialize.frontier(corpus)
      val centroids = graft.core.Materialize.frontier(
        Similarity.ivfCentroids(c, nlist = 0, portable = true))
      val codebooks = graft.core.Materialize.frontier(
        Similarity.pqCodebooks(c, m = 4, ksub = 16, portable = true))
      val codes = graft.core.Materialize.frontier(Similarity.quantizeInt8(c))
      val pqCodes = graft.core.Materialize.frontier(
        Similarity.pqAssign(c, codebooks))
      def ids(df: DataFrame): Set[Long] =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val methods: Seq[(String, DataFrame => DataFrame)] = Seq(
        "sim2_lsh" -> ((q: DataFrame) =>
          Similarity.lshTopK(c, q, k = K, nPlanes = 6, portablePlanes = true)),
        "sim3_ivf" -> ((q: DataFrame) =>
          Similarity.ivfTopK(c, centroids, q, k = K, nProbe = 3)),
        "sim5_int8" -> ((q: DataFrame) =>
          Similarity.int8TopK(codes, Similarity.quantizeInt8(q), k = K)),
        "sim6_pq" -> ((q: DataFrame) =>
          Similarity.pqTopK(pqCodes, codebooks, q, k = K)),
        "sim7_ivfpq" -> ((q: DataFrame) =>
          Similarity.ivfPqTopK(c, centroids, codebooks, q, k = K, nProbe = 3)),
        // raw projected dot — the sim8 oracle row's exact-integer
        // contract; at corpus scale long-projection vectors drown true
        // neighbors (see jlTopK scaladoc), hence the normalized twin
        "sim8_jl_raw" -> ((q: DataFrame) =>
          Similarity.jlTopK(c, q, k = K, dims = 16)),
        // projected-cosine ranking (the standard SRP estimator) at the
        // first-pass operating point: a 10x candidate pool for re-rank
        "sim8_jl_cos" -> ((q: DataFrame) =>
          Similarity.jlTopK(c, q, k = K, dims = 16, normalize = true)),
        "sim8_jl_cos_cand10x" -> ((q: DataFrame) =>
          Similarity.jlTopK(c, q, k = 10 * K, dims = 16, normalize = true)))
      val hits = scala.collection.mutable.Map.empty[String, Long]
      queryIds.foreach { qid =>
        val q = c.where(col("vec_id") === qid)
        val truth = ids(Similarity.bruteForceTopK(c, q, k = K))
        methods.foreach { case (name, f) =>
          hits(name) = hits.getOrElse(name, 0L) + (truth & ids(f(q))).size
        }
      }
      methods.map { case (name, _) => name -> hits(name) / (NQueries * K).toDouble }
    }

    def js(rs: Seq[(String, Double)]): String =
      rs.map { case (k2, v) => s""""$k2":${f"$v%.3f"}""" }.mkString(",")
    val natural = report(e)
    val plantedR = report(e.unionByName(planted))
    val randomBaseline = K.toDouble / n
    val line =
      s"""{"metric":"ann_recall@$K","n_vectors":$n,"n_queries":$NQueries,""" +
        s""""random_baseline":${f"$randomBaseline%.4f"},""" +
        s""""natural":{${js(natural)}},"planted":{${js(plantedR)}}}"""
    println(line)
    val out = java.nio.file.Paths.get("bench_out", s"recall_$tag.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (line + "\n").getBytes)
    spark.stop()
  }
}
