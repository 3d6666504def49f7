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

    /** Coverage-vs-distortion decomposition (round-12 ask): for the
      * cell-probing methods, recall loss has two independent causes —
      * the true neighbors' cells were never probed (CANDIDATE COVERAGE,
      * fixed only by probing more cells) vs the quantized distance
      * misranked candidates that WERE in reach (DISTORTION, fixed by an
      * exact re-rank over a slightly larger shortlist). Per nProbe p:
      *   - `coverage`: |truth ∩ probed cells| / K — the ceiling no
      *     ranking inside probed cells can exceed;
      *   - `ivf`: exact cosine inside probed cells (= the ceiling,
      *     modulo k-th-place ties) — pure coverage;
      *   - `ivfpq`: ADC ranking inside probed cells — coverage AND
      *     distortion;
      *   - `ivfpq_rr10`: ADC shortlist of 10k, exact re-rank to k —
      *     distortion repaired, coverage untouched.
      * `pq` scans everything (coverage = 1), so its gap is pure
      * distortion and `pq_rr10` shows how much a 10x shortlist repairs.
      */
    def curve(corpus: DataFrame, nProbes: Seq[Int],
              pqMults: Seq[Int]): Seq[(String, Double)] = {
      graft.functions.GraftFunctions.register(spark)
      val c = graft.core.Materialize.frontier(corpus)
      val centroids = graft.core.Materialize.frontier(
        Similarity.ivfCentroids(c, nlist = 0, portable = true))
      val codebooks = graft.core.Materialize.frontier(
        Similarity.pqCodebooks(c, m = 4, ksub = 16, portable = true))
      val pqCodes = graft.core.Materialize.frontier(
        Similarity.pqAssign(c, codebooks))
      val assigned = graft.core.Materialize.frontier(
        Similarity.ivfAssignIds(c, centroids))
      def ids(df: DataFrame): Set[Long] =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      def rerank(q: DataFrame, shortlist: DataFrame): DataFrame =
        Similarity.bruteForceTopK(
          c.join(shortlist.select("vec_id"), Seq("vec_id")), q, k = K)
      val hits = scala.collection.mutable.Map.empty[String, Double]
      def add(k2: String, v: Double): Unit =
        hits(k2) = hits.getOrElse(k2, 0.0) + v
      queryIds.foreach { qid =>
        val q = c.where(col("vec_id") === qid)
        val truth = ids(Similarity.bruteForceTopK(c, q, k = K))
        // cell of each true neighbor (tiny collect: K rows)
        val truthCells = assigned
          .where(col("vec_id").isin(truth.toSeq.map(java.lang.Long.valueOf): _*))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // probe ranking exactly as ivfTopK orders it
        val rankedCells = centroids
          .select(col("centroid_id"),
            graft.datapipe.Vectors.quantize(col("embedding")).as("qc"))
          .crossJoin(broadcast(q.select(
            graft.datapipe.Vectors.quantize(col("embedding")).as("qq"))))
          .withColumn("cos", graft.datapipe.Vectors.cosineQN(col("qc"), col("qq")))
          .orderBy(desc("cos"), col("centroid_id"))
          .select("centroid_id").collect().map(_.getLong(0))
        nProbes.foreach { p =>
          val probed = rankedCells.take(p).toSet
          add(s"coverage_nprobe$p",
            truth.count(t => truthCells.get(t).exists(probed)).toDouble / K)
          add(s"ivf_nprobe$p",
            (truth & ids(Similarity.ivfTopK(c, centroids, q, K, p))).size.toDouble / K)
          add(s"ivfpq_nprobe$p",
            (truth & ids(Similarity.ivfPqTopK(c, centroids, codebooks, q, K, p))).size.toDouble / K)
          add(s"ivfpq_nprobe${p}_rr10",
            (truth & ids(rerank(q,
              Similarity.ivfPqTopK(c, centroids, codebooks, q, 10 * K, p)))).size.toDouble / K)
        }
        add("pq", (truth & ids(Similarity.pqTopK(pqCodes, codebooks, q, K))).size.toDouble / K)
        // pq scans every code (coverage = 1), so the shortlist-multiplier
        // sweep isolates how much exact re-rank budget repairs ADC
        // distortion — the candidate-multiplier half of the operating
        // curve (r16 item 6: natural neighborhoods get the wider sweep)
        pqMults.foreach { mu =>
          add(s"pq_rr$mu", (truth & ids(rerank(q,
            Similarity.pqTopK(pqCodes, codebooks, q, mu * K)))).size.toDouble / K)
        }
      }
      hits.toSeq.sortBy(_._1).map { case (k2, v) => k2 -> v / NQueries }
    }

    def js(rs: Seq[(String, Double)]): String =
      rs.map { case (k2, v) => s""""$k2":${f"$v%.3f"}""" }.mkString(",")
    val natural = report(e)
    val plantedR = report(e.unionByName(planted))
    // planted keeps the r12 operating points (comparable across rounds);
    // natural gets the widened knob sweep (r16 item 6): probe levels up
    // toward nlist ≈ √n and larger exact-re-rank shortlists, to locate —
    // or honestly rule out — a knee on structureless data
    val curvePlanted = curve(e.unionByName(planted), Seq(1, 3, 5, 10), Seq(10))
    val curveNatural = curve(e, Seq(1, 3, 5, 10, 25, 50, 100), Seq(10, 30, 100))
    val randomBaseline = K.toDouble / n
    val line =
      s"""{"metric":"ann_recall@$K","n_vectors":$n,"n_queries":$NQueries,""" +
        s""""random_baseline":${f"$randomBaseline%.4f"},""" +
        s""""natural":{${js(natural)}},"planted":{${js(plantedR)}},""" +
        s""""curve_planted":{${js(curvePlanted)}},""" +
        s""""curve_natural":{${js(curveNatural)}}}"""
    println(line)
    val out = java.nio.file.Paths.get("bench_out", s"recall_$tag.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (line + "\n").getBytes)
    spark.stop()
  }
}
