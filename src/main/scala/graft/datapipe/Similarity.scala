package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact cosine top-k — the correctness baseline. One
  *   broadcast of the query vector, one scan, one TakeOrderedAndProject.
  * - `lshTopK`: random-hyperplane LSH bucketing — candidates share the
  *   query's signature (within probing distance), then exact re-rank. The
  *   scale path: the scan is partition-pruned to matching buckets when the
  *   signature is a partition/bucket column.
  * - `ivfTopK`: inverted-file variant — vectors pre-assigned to nearest
  *   centroid; probe the `nProbe` closest centroids, exact re-rank inside.
  *
  * ==Operating guidance (measured, `bench_out/recall_sf1.json`)==
  * The r12 coverage-vs-distortion curve (20k vectors, planted
  * neighborhoods — the near-dup retrieval task) separates the two recall
  * losses: CANDIDATE COVERAGE (true neighbors in unprobed cells; only
  * more probes help) and QUANTIZATION DISTORTION (ADC misranks reachable
  * candidates; an exact re-rank over a slightly larger shortlist repairs
  * it). Findings and recommended configs:
  *
  *  - IVF recall EQUALS candidate coverage at every nProbe (0.765 / 0.98
  *    / 1.00 at nProbe 1/3/5) — in-cell ranking is exact, so tune
  *    `nProbe` alone. Recommend `nProbe = 3` (0.98) or 5 (1.00) with
  *    sqrt(n) trained centroids.
  *  - IVF+PQ pays ~0.1 extra recall to ADC distortion once coverage
  *    saturates (0.895 at nProbe 5 vs 1.00 ceiling) — and a 10x
  *    shortlist + exact re-rank recovers the ceiling EXACTLY at every
  *    probe level (1.00 at nProbe >= 5). Never ship ADC rankings raw:
  *    `ivfPqTopK(..., k = 10 * k)` then exact re-rank of the pool.
  *  - Full-scan PQ: 0.705 raw -> 1.00 with the same 10x re-rank.
  *  - int8 scalar quantization: 0.925+ with NO re-rank — the robust
  *    default when 1 byte/dim fits memory.
  *  - JL projection: use `normalize = true` (projected cosine) + a 10x
  *    re-rank pool (1.00 planted); raw projected dots lose
  *    self-retrieval at corpus scale.
  *
  * On structureless corpora (the synthetic `natural` section) coverage
  * itself binds (top-k are statistical ties spread uniformly over
  * cells) and no re-rank budget recovers it — expected, documented, and
  * why the planted section is the meaningful floor.
  */
object Similarity {

  /** Exact top-k by cosine against one query vector (given as a 1-row
    * DataFrame with `vecCol`). Deterministic tie-break on id.
    */
  def bruteForceTopK(
      vecs: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    // norms once per side: the query norm is a broadcast scalar, the vector
    // norm one extra column — the per-row work is a single dot product
    val q = query.limit(1)
      .select(Vectors.quantize(col(vecCol)).as("q_query"))
      .withColumn("q_nrm", sqrt(Vectors.dotQN(col("q_query"), col("q_query")).cast("double")))
    graft.core.Parallelism.widenForCpu(vecs)
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("q_vec"))
      .withColumn("v_nrm", sqrt(Vectors.dotQN(col("q_vec"), col("q_vec")).cast("double")))
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        Vectors.dotQN(col("q_vec"), col("q_query")).cast("double") /
          (col("v_nrm") * col("q_nrm")))
      .select(col(idCol), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** All-pairs-free ANN: LSH signatures partition the space; exact re-rank
    * within the query's bucket. `nPlanes` controls bucket granularity
    * (recall/cost trade-off).
    */
  def lshTopK(
      vecs: DataFrame, query: DataFrame, k: Int, nPlanes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      portablePlanes: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val sig = (df: DataFrame, out: String) => df
      .withColumn("q", Vectors.quantize(col(vecCol)))
      .withColumn(out,
        if (portablePlanes) Vectors.lshSignaturePortable(col("q"), nPlanes)
        else Vectors.lshSignature(col("q"), nPlanes))
    val qSig = sig(query.limit(1), "bucket")
      .select(col("q").as("q_query"), col("bucket"))
    sig(graft.core.Parallelism.widenForCpu(vecs), "bucket")
      .join(broadcast(qSig), Seq("bucket"))
      .withColumn("cosine", Vectors.cosineQN(col("q"), col("q_query")))
      .select(col(idCol), col("bucket"), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** IVF: centroids = a deterministic sample (caller supplies); assign
    * every vector to its nearest centroid (broadcast centroids), then
    * answer queries by probing the nProbe nearest centroids only.
    */
  def ivfAssign(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame =
    // Assignment ids first, vector payload re-joined by id AFTERWARDS:
    // the n x nlist scored intermediate must never carry the embedding
    // array. When it did (max_by over struct(cid, q_vec)), the partial
    // aggregate's rows were ~dim*8 bytes wide — at sf10 (200k x 448
    // centroids, dim 64) that is a ~50 GB object-sort/spill, measured as
    // the 110x sim3_ivf_trained blow-up (SCALE.md round 7). The id join
    // back onto the corpus is one narrow exchange of n rows.
    ivfAssignIds(vecs, centroids, idCol, vecCol, centroidIdCol)
      .join(vecs.select(col(idCol), Vectors.quantize(col(vecCol)).as("q_vec")),
        Seq(idCol))
      .select(col(idCol), col(centroidIdCol), col("q_vec"))

  /** Assignment WITHOUT the vector payload: (id, centroid_id) only —
    * computed as a PER-ROW argmax over the packed broadcast centroid
    * array ([[graft.functions.NearestCentroidLong]]): n rows in, n rows
    * out, NO n×k intermediate and no aggregate at all.
    *
    * Preconditions (ADVICE r13): embeddings must be NON-NULL — a null
    * vector maps to the -1 sentinel and is silently dropped by the
    * sentinel filter (the old max_by formulation emitted (id, null) for
    * it); and centroid ids must be NON-NEGATIVE, since a legitimately
    * negative id would be indistinguishable from the empty-centroid-set
    * sentinel. Both hold for every in-repo caller (ids are
    * row_number/monotonic-derived, embeddings come from the non-null
    * `embeddings.embedding` column); [[pqAssign]] has the same contract
    * for its codes.
    *
    * History (r13, SCALE.md): the previous row-explosion form —
    * crossJoin(broadcast(centroids)) then groupBy(id).max_by(cid,
    * struct(cosine, -cid)) — put a struct in the aggregate buffer, which
    * HashAggregate cannot hold, so Catalyst planned SortAggregate and
    * every task SORTED its n×k score slice: at sf100 (2M × 1414
    * centroids = 2.8e9 rows) that one stage ran 1129 s and spilled
    * 139 GB for a 46 MB result. The per-row loop computes the identical
    * cosines in the identical double steps and keeps the lowest cid on
    * exact ties (Double.compare — Spark's own double total order), so
    * results are bit-equal; oracle rows pin it.
    */
  def ivfAssignIds(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    // one row: centroids sorted by cid (ascending iteration = min-cid
    // tie-break), each with its quantized vector and precomputed norm
    val packed = centroids
      .select(struct(
        col(centroidIdCol).cast("long").as("cid"),
        Vectors.quantize(col(vecCol)).as("q_cent"),
        sqrt(Vectors.dotQ(Vectors.quantize(col(vecCol)),
          Vectors.quantize(col(vecCol))).cast("double")).as("cnorm")).as("__c"))
      .agg(sort_array(collect_list(col("__c"))).as("__cents"))
    graft.core.Parallelism.widenForCpu(vecs)
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("q_vec"))
      .crossJoin(broadcast(packed))
      .select(col(idCol),
        call_function(graft.functions.GraftFunctions.nearestCentroidName,
          col("q_vec"), col("__cents")).as(centroidIdCol))
      // empty centroid set -> sentinel -1; the old groupBy-over-scores
      // shape emitted no rows at all in that degenerate case
      .where(col(centroidIdCol) >= 0)
  }

  /** One k-means refinement iteration over quantized vectors: assign each
    * vector to its nearest centroid (cosine), then recompute centroids as
    * per-dimension means. Shuffle profile: one exchange on vec_id for the
    * assignment-to-payload join (the argmax itself is a per-row map since
    * r13), one on (centroid, dim) for the means — partial-aggregating,
    * no windows, no corpus-scale collect. Means
    * are exact-integer sums divided once, so results are engine-exact.
    * Returns (centroid_id, pos, mean_q) — the new centroid matrix in
    * long-micro-units as one row per dimension.
    */
  def kmeansIter(
      vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val assigned = ivfAssign(vecs, centroids, idCol, vecCol, centroidIdCol)
    assigned
      .select(col(centroidIdCol), posexplode(col("q_vec")).as(Seq("pos", "v")))
      .groupBy(centroidIdCol, "pos")
      .agg((sum(col("v")).cast("double") / count(lit(1)).cast("double")).as("mean_q"))
      .select(col(centroidIdCol), col("pos").cast("long").as("pos"), col("mean_q"))
      .orderBy(col(centroidIdCol), col("pos"))
  }

  def ivfTopK(
      vecs: DataFrame, centroids: DataFrame, query: DataFrame,
      k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val qq = query.limit(1).select(Vectors.quantize(col(vecCol)).as("q_query"))
    val probes = centroids
      .select(col(centroidIdCol), Vectors.quantize(col(vecCol)).as("q_cent"))
      .crossJoin(broadcast(qq))
      .withColumn("cosine", Vectors.cosineQN(col("q_cent"), col("q_query")))
      .orderBy(desc("cosine"), col(centroidIdCol))
      .limit(nProbe)
      .select(col(centroidIdCol))
    // probe-filter the id-only assignment BEFORE fetching vector payload:
    // only ~n*nProbe/nlist candidate ids survive, so the re-join touches
    // arrays for the probed cells alone (AQE broadcasts the candidate
    // side against the corpus scan — no corpus shuffle)
    val candidates = ivfAssignIds(vecs, centroids, idCol, vecCol, centroidIdCol)
      .join(broadcast(probes), Seq(centroidIdCol))
      .join(vecs.select(col(idCol), Vectors.quantize(col(vecCol)).as("q_vec")),
        Seq(idCol))
    candidates
      .crossJoin(broadcast(qq))
      .withColumn("cosine", Vectors.cosineQN(col("q_vec"), col("q_query")))
      .select(col(idCol), col(centroidIdCol), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Deterministic IVF centroid seeding: `nlist` vectors in hashed-id
    * order — a seeded pseudo-random sample with no RNG state (same input,
    * same centroids, any partitioning). `nlist <= 0` sizes the list as
    * ceil(sqrt(n)), the standard inverted-file rule: assignment work stays
    * n*sqrt(n) instead of the n² a data-proportional centroid rule
    * produces (the sf1 rehearsal measured the sim3 query's "every 50th
    * vector" rule at 31x for 10x data for exactly that reason — see
    * SCALE.md). The count for auto-sizing is one eager metadata-scale job,
    * the normal shape for a training step.
    */
  def ivfCentroids(
      vecs: DataFrame, nlist: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id",
      portable: Boolean = false): DataFrame = {
    val n =
      if (nlist > 0) nlist
      else math.ceil(math.sqrt(vecs.count().toDouble)).toInt
    // portable = md5-of-id ordering any SQL engine reproduces (oracle
    // twin); default xxhash64 is the cheaper production hash
    val h: Column =
      if (portable) md5(col(centroidIdCol).cast("string").cast("binary"))
      else xxhash64(col(centroidIdCol))
    vecs
      .select(col(idCol).as(centroidIdCol), col(vecCol))
      .orderBy(h, col(centroidIdCol))
      .limit(n) // TakeOrderedAndProject: never materializes a full sort
  }

  /** Reshape one [[kmeansIter]] mean matrix (centroid_id, pos, mean_q in
    * integer micro-units) back into a centroids frame with a float-array
    * `vecCol` — the glue that lets iterations chain. In-row sort of each
    * centroid's dimension list; one exchange on centroid_id.
    */
  def centroidsFromMeans(
      means: DataFrame, vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame =
    means
      .groupBy(centroidIdCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("mean_q")))).as("dims"))
      .select(col(centroidIdCol),
        transform(col("dims"), d =>
          (d.getField("mean_q") / 1000000.0).cast("float")).as(vecCol))

  /** Lloyd's k-means over the embedding column: deterministic hashed-id
    * seeding, `iters` assign+mean refinement rounds. Each round is the two
    * partial-aggregating exchanges of [[kmeansIter]]; centroid frames are
    * dimension-scale (nlist rows), so the loop materializes only tiny
    * frames between rounds. Returns the final centroids — feed to
    * [[ivfAssign]]/[[ivfTopK]] as the trained index.
    */
  def ivfTrain(
      vecs: DataFrame, nlist: Int = 0, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroidIdCol: String = "centroid_id"): DataFrame = {
    var c = ivfCentroids(vecs, nlist, idCol, vecCol, centroidIdCol)
    var prev: Option[graft.core.Frontier] = None
    for (_ <- 0 until iters) {
      val h = graft.core.Materialize.frontierHandle(centroidsFromMeans(
        kmeansIter(vecs, c, idCol, vecCol, centroidIdCol),
        vecCol, centroidIdCol))
      // round i's centroids fed round i+1's assignment, now materialized
      prev.foreach(_.release())
      prev = Some(h)
      c = h.df
    }
    c
  }

  /** Scalar int8 quantization of the embedding column — the standard
    * vector-compression step before ANN at corpus scale (an fp32 dim
    * becomes one byte: 8× less storage, shuffle, and cache footprint; the
    * published SQ8 scheme of the FAISS/ScaNN family). One global
    * symmetric scale s = max |component| (a single partial-aggregate
    * action, broadcast back), then code = floor(x·127/s + 0.5) clamped to
    * [-127, 127].
    *
    * Determinism: codes derive from the repo's micro-quantized integers
    * (`Vectors.quantize`), and the only floating step is one double
    * multiply/divide per component with floor rounding — every engine
    * reproduces the exact code vector, so downstream integer dot products
    * are engine-exact (the d4/sim1 discipline applied to compression).
    * Codes are emitted as `array<tinyint>` — the compressed form IS the
    * point; [[int8TopK]] widens per element inside its integer fold.
    */
  def quantizeInt8(vecs: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding",
                   codesCol: String = "codes"): DataFrame = {
    val micro = graft.core.Parallelism.widenForCpu(vecs)
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("__q"))
    val scale = micro.agg(
      coalesce(max(array_max(transform(col("__q"), x => abs(x)))), lit(1L))
        .as("__s"))
    micro.crossJoin(broadcast(scale))
      .select(col(idCol),
        transform(col("__q"), x =>
          greatest(lit(-127L), least(lit(127L),
            floor(x.cast("double") * 127.0 / col("__s").cast("double") + 0.5)
              .cast("long")))
            .cast("byte")).as(codesCol))
  }

  /** Product quantization codebooks (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011) — the other standard
    * compression scheme next to [[quantizeInt8]], and the half of IVF+PQ
    * that makes billion-vector ANN tractable: dimensions split into `m`
    * subspaces, each with its own `ksub`-entry codebook, so a vector
    * stores m small codes (one byte each at ksub ≤ 256) instead of D
    * floats.
    *
    * Codebook entries are seeded from the first `ksub` vectors in
    * hashed-id order (the [[ivfCentroids]] discipline; `portable` = the
    * md5 oracle twin) and sub-sliced — micro-quantized integer
    * sub-centroids, so assignment and ADC distances below are exact
    * integer arithmetic any engine reproduces. Refinement (k-means over
    * sub-vectors) composes via [[kmeansIter]] per subspace if a caller
    * wants trained codebooks; the seeded form is the deterministic
    * baseline the oracle can check.
    *
    * Output: (m, code, qc) — `m` the subspace, `code` 0..ksub−1 dense by
    * hash order, `qc` the quantized sub-centroid. m·ksub rows total:
    * broadcast-size at any corpus scale.
    */
  def pqCodebooks(vecs: DataFrame, m: Int = 4, ksub: Int = 16,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  portable: Boolean = false): DataFrame = {
    require(m > 0 && ksub > 0, "m and ksub must be positive")
    val seeds = ivfCentroids(vecs, ksub, idCol, vecCol, "centroid_id", portable)
    val h: Column =
      if (portable) md5(col("centroid_id").cast("string").cast("binary"))
      else xxhash64(col("centroid_id"))
    // dense 0..ksub-1 codes in the same hash order (ksub rows: the window
    // is codebook-scale, not corpus-scale)
    val coded = seeds
      .withColumn("code",
        row_number().over(Window.orderBy(h, col("centroid_id"))) - 1)
      .select(col("code"), Vectors.quantize(col(vecCol)).as("__qv"))
    coded
      .select(col("code"), col("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("m"),
        expr(s"(size(__qv) + ${m - 1}) div $m").as("__L"))
      .select(col("m"), col("code"),
        slice(col("__qv"), col("m") * col("__L") + 1, col("__L")).as("qc"))
  }

  /** Integer L2 contrast for PQ argmin/ADC: ||c||² − 2·x·c in quantized
    * micro units — the rank-equivalent part of ||x − c||² (the ||x||²
    * term is constant per sub-vector and cancels in both the argmin and
    * the per-query ranking).
    */
  private def pqDist(qx: Column, qc: Column): Column =
    Vectors.dotQN(qc, qc) - lit(2L) * Vectors.dotQN(qx, qc)

  /** PQ assignment: per vector and subspace, the code of the nearest
    * codebook entry (integer L2, ties to the smaller code), computed as
    * a PER-ROW argmin over the packed broadcast sub-codebook
    * ([[graft.functions.NearestCodeLong]]): n·m (id, subspace) rows in,
    * n·m code values out — no n·m·ksub candidate explosion. The old
    * min_by(code, struct(__d, code)) put a struct in the aggregate
    * buffer, forcing SortAggregate over the exploded candidates (the
    * exact cliff ivfAssignIds hit at sf100, SCALE.md r13); the integer
    * argmin here is bit-equal by construction. Output: (id, codes
    * array<int>, ordered by subspace) — the compressed representation.
    * Same preconditions as [[ivfAssignIds]]: non-null embeddings (a null
    * sub-vector maps to the -1 sentinel and drops) and non-negative
    * codebook codes (-1 is the empty-codebook sentinel).
    */
  def pqAssign(vecs: DataFrame, codebooks: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val m = codebooks.agg(max(col("m"))).head().getInt(0) + 1
    val sub = graft.core.Parallelism.widenForCpu(vecs)
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("__qv"))
      .select(col(idCol), col("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("m"),
        expr(s"(size(__qv) + ${m - 1}) div $m").as("__L"))
      .select(col(idCol), col("m"),
        slice(col("__qv"), col("m") * col("__L") + 1, col("__L")).as("qx"))
    // m rows, each holding its whole sub-codebook sorted by code
    // (ascending iteration = min-code tie-break), with ||c||² precomputed
    val packed = codebooks
      .select(col("m"), struct(
        col("code").cast("long").as("code"), col("qc"),
        Vectors.dotQ(col("qc"), col("qc")).as("qcself")).as("__e"))
      .groupBy("m")
      .agg(sort_array(collect_list(col("__e"))).as("__codes"))
    sub
      .join(broadcast(packed), Seq("m"))
      .select(col(idCol), col("m"),
        call_function(graft.functions.GraftFunctions.nearestCodeName,
          col("qx"), col("__codes")).cast("int").as("code"))
      .where(col("code") >= 0)
      .groupBy(idCol)
      .agg(transform(
        sort_array(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query's exact
    * distance to every codebook entry forms an m·ksub lookup table
    * (broadcast); each stored vector's score is the sum of its m looked-up
    * entries — no decompression, one broadcast join + one (id) partial
    * aggregate. Returns (id, pq_dist) ascending (ties to smaller id).
    *
    * ==Do not ship raw ADC rankings at scale== Measured
    * (`bench_out/recall_sf10.json`): raw ADC planted recall COLLAPSES as
    * the corpus grows — 0.705 at 20k vectors (sf1) down to 0.35 at 200k
    * (sf10) — because quantization distortion misranks an ever-larger
    * pool of near-ties at the m=4, ksub=16 code rate. A 10× shortlist +
    * exact re-rank ([[pqTopKRerank]]) recovers 0.99–1.00 at BOTH scales
    * for ~k·mult extra exact dots. This entry point is the building
    * block; the production contract is [[pqTopKRerank]] (full-scan PQ)
    * or [[ivfPqTopK]] with a re-ranked shortlist (see SCALE.md).
    */
  def pqTopK(codes: DataFrame, codebooks: DataFrame, query: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(codes.sparkSession)
    val m = codebooks.agg(max(col("m"))).head().getInt(0) + 1
    val qsub = query.limit(1)
      .select(Vectors.quantize(col(vecCol)).as("__qv"))
      .select(col("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("m"),
        expr(s"(size(__qv) + ${m - 1}) div $m").as("__L"))
      .select(col("m"),
        slice(col("__qv"), col("m") * col("__L") + 1, col("__L")).as("qx"))
    val table = qsub.join(codebooks, Seq("m"))
      .select(col("m"), col("code"), pqDist(col("qx"), col("qc")).as("__d"))
    codes
      .select(col(idCol), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(table), Seq("m", "code"))
      .groupBy(idCol)
      .agg(sum(col("__d")).as("pq_dist"))
      .orderBy(col("pq_dist"), col(idCol))
      .limit(k)
  }

  /** PQ-ADC search with exact re-rank — the PRODUCTION full-scan-PQ
    * contract (Jégou 2011 §V-C's two-stage refinement): [[pqTopK]]
    * proposes a `k·mult` shortlist from compressed codes (the corpus
    * touched only through byte codes), then the shortlist's FULL vectors
    * — k·mult rows, broadcast-size at any corpus scale — are fetched and
    * re-ranked by exact quantized cosine. The compressed scan stays the
    * only corpus-wide pass; the exact pass is O(k·mult) dots, so the
    * re-rank costs ~nothing while repairing ADC's quantization
    * misranking (measured: planted recall 0.35 raw → 0.99 re-ranked at
    * sf10, `bench_out/recall_sf10.json`). Output matches
    * [[bruteForceTopK]]: (id, cosine) descending, ties to smaller id.
    */
  def pqTopKRerank(codes: DataFrame, codebooks: DataFrame, vecs: DataFrame,
                   query: DataFrame, k: Int, mult: Int = 10,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(mult >= 1, "mult must be positive")
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val shortlist = pqTopK(codes, codebooks, query, k * mult, idCol, vecCol)
      .select(col(idCol))
    val q = query.limit(1)
      .select(Vectors.quantize(col(vecCol)).as("q_query"))
    vecs.join(broadcast(shortlist), Seq(idCol))
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("q_vec"))
      .crossJoin(broadcast(q))
      .withColumn("cosine", Vectors.cosineQN(col("q_vec"), col("q_query")))
      .select(col(idCol), col("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** IVF + PQ — the composed billion-vector ANN architecture (Jégou 2011
    * §IV): IVF routes the query to `nProbe` probed cells, PQ's
    * asymmetric-distance table ranks the candidates inside them — the
    * corpus is touched only through the id-only assignment and the
    * byte-code table; full vectors are never fetched OR decompressed in
    * the search path. Probe selection mirrors [[ivfTopK]] (cosine,
    * centroid-id tie-break); ranking is [[pqTopK]]'s broadcast m·ksub
    * lookup restricted to candidates in probed cells. All-integer, so an
    * oracle reproduces cell choice, codes, and distances exactly.
    */
  def ivfPqTopK(vecs: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                query: DataFrame, k: Int, nProbe: Int = 2,
                idCol: String = "vec_id", vecCol: String = "embedding",
                centroidIdCol: String = "centroid_id"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val qq = query.limit(1).select(Vectors.quantize(col(vecCol)).as("q_query"))
    val probes = centroids
      .select(col(centroidIdCol), Vectors.quantize(col(vecCol)).as("q_cent"))
      .crossJoin(broadcast(qq))
      .withColumn("cosine", Vectors.cosineQN(col("q_cent"), col("q_query")))
      .orderBy(desc("cosine"), col(centroidIdCol))
      .limit(nProbe)
      .select(col(centroidIdCol))
    val candidates = ivfAssignIds(vecs, centroids, idCol, vecCol, centroidIdCol)
      .join(broadcast(probes), Seq(centroidIdCol))
      .select(idCol)
    pqTopK(pqAssign(vecs, codebooks, idCol, vecCol).join(candidates, Seq(idCol)),
      codebooks, query, k, idCol, vecCol)
  }

  /** Exact top-k by integer dot product over int8 codes against one query
    * (1-row DataFrame with `codesCol`). Ranking by raw quantized dot —
    * for the ~unit-norm embeddings this column carries, dot order is
    * cosine order up to quantization error (the recall trade the
    * compression buys; spec pins recall on clustered fixtures).
    * Per-element widening inside the fold keeps the arithmetic in longs
    * (byte×byte would overflow at ANSI semantics).
    */
  def int8TopK(codes: DataFrame, query: DataFrame, k: Int,
               idCol: String = "vec_id", codesCol: String = "codes"): DataFrame = {
    val q = query.limit(1).select(col(codesCol).as("__qc"))
    codes
      .crossJoin(broadcast(q))
      .withColumn("qdot",
        aggregate(
          zip_with(col(codesCol), col("__qc"),
            (x, y) => x.cast("long") * y.cast("long")),
          lit(0L), (acc, x) => acc + x))
      .select(col(idCol), col("qdot"))
      .orderBy(desc("qdot"), col(idCol))
      .limit(k)
  }

  /** Johnson-Lindenstrauss sign-matrix random projection (Achlioptas
    * 2001): each micro-quantized vector becomes `dims` exact integer
    * coordinates, coordinate p = the ±1-weighted component sum under the
    * SAME portable LCG hyperplanes the SRP bucketing uses
    * ([[Vectors.portablePlaneSign]]) — so projections are engine-exact
    * and bit-reproducible anywhere. dims=16 turns a 64-float vector into
    * 16 longs (4× fewer multiplies per distance); inner products are
    * preserved up to the JL distortion, making this the standard
    * cheap-first-pass before exact re-rank at corpus scale.
    */
  def jlProject(vecs: DataFrame, dims: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    graft.core.Parallelism.widenForCpu(vecs)
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("__q"))
      .select(col(idCol), Vectors.jlProjectN(col("__q"), dims).as("proj"))
  }

  /** Approximate top-k by exact integer dot product in the projected
    * space — a map-side scan over `dims`-long vectors plus one
    * TakeOrderedAndProject; re-rank the result with [[bruteForceTopK]]
    * when exact cosine order matters.
    *
    * `normalize = false` ranks by the RAW projected dot — engine-exact
    * integer arithmetic (the sim8 oracle row's contract), but at corpus
    * scale a long vector pointed vaguely the right way outranks a true
    * neighbor: projected norms of unit vectors vary ~chi²(dims), and the
    * max raw dot over n random vectors overtakes a cosine-0.99
    * neighbor's once n·dims crosses ~10^4·16 (measured in the recall
    * artifact: self-retrieval itself fails at 20k vectors).
    * `normalize = true` ranks by projected COSINE (the standard SRP
    * estimator — normalize both sides' projections), which restores the
    * neighbor ordering the projection actually preserves; values are
    * doubles derived from the same exact integer dots, ties broken by
    * id, so the ranking is still deterministic.
    */
  def jlTopK(vecs: DataFrame, query: DataFrame, k: Int, dims: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding",
             normalize: Boolean = false): DataFrame = {
    val pq = broadcast(jlProject(query.limit(1), dims, idCol, vecCol)
      .select(col("proj").as("__qp")))
    val scored = jlProject(vecs, dims, idCol, vecCol)
      .crossJoin(pq)
      .withColumn("pdot", Vectors.dotQN(col("proj"), col("__qp")))
    if (normalize)
      scored
        .withColumn("pcos", col("pdot").cast("double") /
          (sqrt(Vectors.dotQN(col("proj"), col("proj")).cast("double")) *
            sqrt(Vectors.dotQN(col("__qp"), col("__qp")).cast("double"))))
        .select(col(idCol), col("pcos"))
        .orderBy(desc("pcos"), col(idCol))
        .limit(k)
    else
      scored
        .select(col(idCol), col("pdot"))
        .orderBy(desc("pdot"), col(idCol))
        .limit(k)
  }
}
