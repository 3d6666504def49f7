package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * NeurIPS 2023): select pretraining documents that look like a target
  * domain by importance weight under two HASHED-N-GRAM bag-of-words
  * models, log w(x) = Σ_features [ln p_target(bucket) − ln p_raw(bucket)].
  * The published 100 TB-friendly contrast to Moore-Lewis
  * ([[LanguageModel.crossEntropySelect]]): features are unigrams+bigrams
  * hashed into `nBuckets` buckets, so both "models" are count tables of
  * AT MOST nBuckets rows — broadcastable at any corpus size, no
  * vocabulary growth, no pruning question.
  *
  * Everything is quantized to integer micro-nats (the
  * [[QualityClassifier.quantLog]] scheme) and the feature hash is the
  * repo's portable md5 scheme ([[Sampling.inclusionHash]]), so weights —
  * and the selected set — are engine-exact. Selection here is
  * deterministic top-n by weight (paper §2.3 resamples with Gumbel
  * noise; a caller wanting that adds one hashed-id Gumbel column and
  * re-ranks — the weight computation is the operator).
  *
  * Scale shape: two map-side explode legs (unigrams, bigram pairs; see
  * [[hashedFeatures]] for why not one), two broadcast joins against
  * ≤nBuckets-row count frames, one (id) partial aggregate, one
  * TakeOrderedAndProject. Document text never enters a shuffle.
  */
object Dsir {

  /** (id, bucket) hashed n-gram feature occurrences: non-empty unigrams
    * plus space-joined bigrams, bucket = portable 24-bit md5 hash mod
    * `nBuckets`. One row per occurrence (bag-of-n-grams, not a set).
    *
    * Native one-pass path (functions.FeatureBucketsMd5, the MinhashMd5
    * playbook): every doc's bucket ids come out of one codegen'd call
    * over its token array, so the plan explodes small LONGS once instead
    * of running two string explode legs with per-row md5+concat
    * expression trees. Spec-pinned bit-identical to the declarative
    * formulation ([[hashedFeaturesDeclarative]], which the DuckDB
    * oracles still state) — same rows, same bag multiplicities.
    */
  def hashedFeatures(docs: DataFrame, nBuckets: Int, seed: Long = 0L,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        explode(call_function(graft.functions.GraftFunctions.featureBucketsName,
          col("__t"), lit(seed), lit(nBuckets))).as("bucket"))
  }

  /** The declarative two-leg formulation [[hashedFeatures]] replaced —
    * kept as the reference its spec pins the native expression against.
    */
  private[datapipe] def hashedFeaturesDeclarative(
      docs: DataFrame, nBuckets: Int, seed: Long = 0L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val uni = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("f"))
      .where(col("f") =!= "")
    val bi = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol), explode(TextAnalysis.adjacentPairs(col("__t"))).as("p"))
      .select(col(idCol), concat_ws(" ", col("p.a"), col("p.b")).as("f"))
    uni.unionByName(bi)
      .select(col(idCol),
        pmod(Sampling.inclusionHash(col("f"), seed), lit(nBuckets.toLong)).as("bucket"))
  }

  /** Hashed-feature counts for one corpus: (bucket, n) — at most
    * `nBuckets` rows regardless of corpus size.
    */
  def featureCounts(docs: DataFrame, nBuckets: Int, seed: Long = 0L,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    hashedFeatures(docs, nBuckets, seed, textCol, idCol)
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Fit = materialized [[featureCounts]] (the [[Similarity.ivfTrain]]
    * pattern, via [[graft.core.Materialize.frontier]]). The count table is
    * ≤`nBuckets` rows by construction, so the checkpoint is metadata-scale
    * at ANY corpus size — and without it every downstream execution
    * re-derives the whole model inline: [[select]] used to carry SIX
    * explode legs over the corpora (candidates + target + raw, two legs
    * each) in one plan, paying the model scans again per run plus a
    * first-execution codegen cliff on the giant fused plan (measured
    * 37 s cold / 8.5 s warm on 5 k docs vs ~3 s with the models
    * materialized). Fitting once also matches the paper's shape: the
    * model is an artifact you reuse across candidate batches.
    */
  def fitModel(docs: DataFrame, nBuckets: Int, seed: Long = 0L,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    graft.core.Materialize.frontier(
      featureCounts(docs, nBuckets, seed, textCol, idCol))

  /** Per-document importance weight against target/raw count tables:
    * (id, n_features, logw_micro) where logw_micro sums quantized
    * ln((n_t+1)/(T_t+B)) − ln((n_r+1)/(T_r+B)) over feature occurrences
    * (Laplace smoothing on both models; an unseen-everywhere bucket
    * contributes the constant prior contrast). Documents with no
    * features produce no row.
    */
  def importanceWeights(candidates: DataFrame,
                        targetCounts: DataFrame, rawCounts: DataFrame,
                        nBuckets: Int, seed: Long = 0L,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def total(counts: DataFrame, name: String): DataFrame =
      counts.agg(coalesce(sum(col("n")), lit(0L)).as(name))
    def smoothedLog(n: Column, tot: Column): Column =
      QualityClassifier.quantLog(
        (coalesce(n, lit(0L)) + 1L).cast("double") /
          (tot + nBuckets.toLong).cast("double"))
    hashedFeatures(candidates, nBuckets, seed, textCol, idCol)
      .join(broadcast(targetCounts.select(col("bucket"), col("n").as("__nt"))),
        Seq("bucket"), "left")
      .join(broadcast(rawCounts.select(col("bucket"), col("n").as("__nr"))),
        Seq("bucket"), "left")
      .crossJoin(broadcast(total(targetCounts, "__tt")))
      .crossJoin(broadcast(total(rawCounts, "__tr")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_features"),
        sum(smoothedLog(col("__nt"), col("__tt")) -
          smoothedLog(col("__nr"), col("__tr"))).as("logw_micro"))
  }

  /** End-to-end DSIR: fit hashed-n-gram models on `targetDocs` and
    * `rawDocs`, weight every candidate, keep the top `n` (weight desc,
    * id asc — deterministic). For the paper's actual resampling step —
    * WITHOUT-replacement sampling proportional to the importance weight
    * rather than a hard argmax — see [[selectGumbel]].
    */
  def select(candidates: DataFrame, targetDocs: DataFrame, rawDocs: DataFrame,
             n: Int, nBuckets: Int = 4096, seed: Long = 0L,
             textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    selectWith(candidates,
      fitModel(targetDocs, nBuckets, seed, textCol, idCol),
      fitModel(rawDocs, nBuckets, seed, textCol, idCol),
      n, nBuckets, seed, textCol, idCol)

  /** [[select]] against PRE-FIT count tables (e.g. [[fitModel]] outputs
    * persisted via `ArtifactStore`/parquet) — the production score-later
    * path: no training anywhere in this plan.
    */
  def selectWith(candidates: DataFrame,
                 targetCounts: DataFrame, rawCounts: DataFrame,
                 n: Int, nBuckets: Int, seed: Long = 0L,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    importanceWeights(candidates, targetCounts, rawCounts,
      nBuckets, seed, textCol, idCol)
      .orderBy(desc("logw_micro"), col(idCol))
      .limit(n)

  /** DSIR §2.3 resampling via the Gumbel-top-k trick: the top n of
    * logw + Gumbel noise is an exact without-replacement sample with
    * inclusion probability proportional to the importance weight (Vieira
    * 2014) — peaked weights still dominate, but the tail gets its
    * proportional share instead of never being drawn. The noise is
    * DETERMINISTIC: g = −ln(−ln(u)) with u = (h + 0.5) / 2^24 from the
    * portable 24-bit id hash, quantized to micro-nats like the weight
    * itself — so the sampled SET is engine-exact and re-runs (or another
    * engine) draw the same sample for the same `gumbelSeed`.
    * One extra map column over [[select]]; same plan shape.
    */
  def selectGumbel(candidates: DataFrame, targetDocs: DataFrame, rawDocs: DataFrame,
                   n: Int, nBuckets: Int = 4096, seed: Long = 0L,
                   gumbelSeed: Long = 1L,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    selectGumbelWith(candidates,
      fitModel(targetDocs, nBuckets, seed, textCol, idCol),
      fitModel(rawDocs, nBuckets, seed, textCol, idCol),
      n, nBuckets, seed, gumbelSeed, textCol, idCol)

  /** [[selectGumbel]] against pre-fit count tables — see [[selectWith]]. */
  def selectGumbelWith(candidates: DataFrame,
                       targetCounts: DataFrame, rawCounts: DataFrame,
                       n: Int, nBuckets: Int, seed: Long = 0L,
                       gumbelSeed: Long = 1L,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val u = (Sampling.inclusionHash(col(idCol), gumbelSeed).cast("double") + 0.5) /
      Sampling.HashSpace.toDouble
    importanceWeights(candidates, targetCounts, rawCounts,
      nBuckets, seed, textCol, idCol)
      .withColumn("gumbel_micro",
        floor(-log(-log(u)) * 1000000d + lit(0.5)).cast("long"))
      .withColumn("gkey_micro", col("logw_micro") + col("gumbel_micro"))
      .orderBy(desc("gkey_micro"), col(idCol))
      .limit(n)
  }
}
