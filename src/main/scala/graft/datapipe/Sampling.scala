package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixing / sharding for training-data curation —
  * the selection stages that sit between dedup/quality filtering and
  * training export.
  *
  * Everything here derives per-row randomness from `md5(seed|id)` instead
  * of an RNG: Spark's `sample`/`sampleBy` draw from per-partition RNG
  * streams, so their output changes with partition layout, AQE decisions,
  * and task retries — unacceptable for reproducible corpus builds (and
  * unverifiable across engines). A hash of the row's id is a pure
  * function: same corpus + same seed = same sample on any cluster, any
  * engine (the DuckDB oracle recomputes every operator here exactly).
  *
  * Scale shape: inclusion tests and shard assignment are pure map
  * expressions (no shuffle, codegen'd md5); [[mixture]] adds one
  * dimension-scale aggregate (per-source counts) broadcast back; only
  * [[tokenBudget]] sorts, and only within each source (see its scaladoc).
  */
object Sampling {

  /** Inclusion-hash space: first 6 md5 hex digits = 24 bits. */
  val HashSpace: Long = 1L << 24

  /** md5("seed|id") — the single source of the cross-engine hash-string
    * format every deterministic-ordering/inclusion twin (and every DuckDB
    * oracle) reproduces. Change the format here and NOWHERE else.
    */
  private[datapipe] def hashStr(id: Column, seed: Long): Column =
    md5(concat_ws("|", lit(seed), id.cast("string")))

  /** Deterministic uniform hash in [0, 2^24): the first 6 hex digits of
    * md5("seed|id"). 24 bits keeps the value exactly convertible in any
    * engine (and far below double's 2^53 if arithmetic routes through FP).
    */
  def inclusionHash(id: Column, seed: Long): Column =
    conv(substring(hashStr(id, seed), 1, 6), 16, 10).cast("long")

  /** The integer inclusion threshold for a fraction in [0, 1]. */
  def thresholdFor(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    math.floor(fraction * HashSpace).toLong
  }

  /** Uniform deterministic sample: keep iff hash(seed|id) < fraction·2^24.
    * Expected |out| = fraction·|docs|; exact membership is reproducible
    * anywhere.
    */
  def sample(docs: DataFrame, fraction: Double, seed: Long = 42L,
             idCol: String = "doc_id"): DataFrame =
    docs.where(inclusionHash(col(idCol), seed) < lit(thresholdFor(fraction)))

  /** Leakage-safe (group-aware) train/holdout split: the split key is
    * the document's near-dup COMPONENT label, not its id, so every
    * member of a duplicate cluster lands in the SAME split — the
    * standard guard against train/eval contamination that a plain
    * per-doc split silently violates (a near-copy of a training doc in
    * the holdout set is leakage, not evaluation). Docs in no pair split
    * by their own id. Deterministic via the portable inclusion hash, so
    * re-runs and other engines draw the identical split. Cost: the
    * component contraction ([[Dedup.duplicateComponents]]) + one
    * left join + a hash predicate; at 100 TB the split itself is
    * map-shaped once the cluster labels exist.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       holdoutFraction: Double, seed: Long = 42L,
                       idCol: String = "doc_id"): DataFrame = {
    val comp = Dedup.duplicateComponents(pairs, idCol = idCol)
      .withColumnRenamed(idCol, "__cid")
    val thr = thresholdFor(holdoutFraction)
    docs
      .join(comp, docs(idCol) === col("__cid"), "left")
      .withColumn("split",
        when(inclusionHash(coalesce(col("cluster_id"), docs(idCol)), seed) < thr,
          "holdout").otherwise("train"))
      .drop("__cid", "cluster_id")
  }

  /** Stratified deterministic sample: per-stratum fractions; strata absent
    * from the map are dropped (threshold 0).
    */
  def stratified(docs: DataFrame, fractions: Map[String, Double],
                 stratumCol: String = "source", seed: Long = 42L,
                 idCol: String = "doc_id"): DataFrame = {
    val thresholds = map(fractions.toSeq.flatMap { case (k, f) =>
      Seq(lit(k), lit(thresholdFor(f)))
    }: _*)
    docs.where(inclusionHash(col(idCol), seed) <
      coalesce(element_at(thresholds, col(stratumCol)), lit(0L)))
  }

  /** Cluster-balanced (diversity-flattening) selection: cap each
    * embedding cluster at `cap` members — the SemDeDup-style move that
    * stops a corpus's dominant semantic clusters from drowning the tail
    * when sampling training data. Vectors are assigned to their nearest
    * centroid ([[Similarity.ivfAssign]]) and each cluster keeps its `cap`
    * lowest by deterministic hash rank (md5("seed|id") string order, id
    * tie-break) — same corpus + seed = same selection, any layout, any
    * engine.
    *
    * Scale shape: assignment is the IVF broadcast-centroids map + one
    * (id) partial-agg exchange carrying (id, centroid_id) rows only
    * ([[Similarity.ivfAssignIds]] — no vector payload); the rank is
    * computed in TWO windows, local-per-(cluster, salt) then global,
    * because dominant head clusters are the whole reason this operator
    * exists: a single per-cluster window would sort the largest cluster
    * in one task. The salted local pass keeps <= cap rows per salt, so
    * the global window ranks at most nSalts x cap candidates per
    * cluster regardless of skew. Output is bounded by nClusters x cap.
    */
  def clusterBalanced(vecs: DataFrame, centroids: DataFrame,
                      cap: Int, seed: Long = 42L, nSalts: Int = 16,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = Similarity.ivfAssignIds(vecs, centroids, idCol, vecCol)
    val hash = hashStr(col(idCol), seed)
    // the global top-cap of the union of per-salt top-caps IS the global
    // top-cap (every global winner wins its own salt group), so the split
    // is semantically invisible — same rows, same ranks, any salt count
    val wLocal = Window.partitionBy("centroid_id", "__salt").orderBy(hash, col(idCol))
    val wGlobal = Window.partitionBy("centroid_id").orderBy(hash, col(idCol))
    assigned
      .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(nSalts.toLong)))
      .withColumn("__r", row_number().over(wLocal))
      .where(col("__r") <= cap)
      .withColumn("sel_rank", row_number().over(wGlobal).cast("long"))
      .where(col("sel_rank") <= cap)
      .drop("__salt", "__r")
  }

  /** Deterministic shard assignment for training export: shard =
    * hash(seed|id) mod nShards — uniform, stable, and independent of
    * partition layout, so a re-run (or another engine) produces the same
    * shard for every document. Write with `partitionBy("shard")` for one
    * directory per shard.
    */
  def assignShards(docs: DataFrame, nShards: Int, seed: Long = 0L,
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("shard", inclusionHash(col(idCol), seed) % nShards)
  }

  /** Greedy sequence packing for training export: within each shard,
    * documents are walked in deterministic hash order and chunked into
    * bins by cumulative token count — bin = floor(exclusive-cumsum /
    * budget), so each bin holds consecutive documents totalling ~budget
    * tokens (documents are atomic: one that crosses the boundary
    * overflows its bin rather than splitting). The final packing step a
    * pre-training exporter runs to turn a curated corpus into
    * fixed-length training sequences.
    *
    * Output: (id, shard, n_tokens, bin, pack_order). Deterministic —
    * shard, order, and bin are pure functions of (seed, id, text), so a
    * re-run or another engine reproduces the exact packing. PRECONDITION:
    * ids are unique (the curation contract upstream guarantees it) — the
    * walk order is (hash(seed|id), id), so duplicate ids are order peers
    * and their relative placement (hence bin/pack_order) would be engine-
    * and run-dependent. Dedup first; this is an exporter, not a cleaner.
    *
    * Scale shape: one window sort per shard (export-time, the same
    * per-stratum-sort shape as [[tokenBudget]]); shards are numerous
    * (thousands for a real export), so each sort partition is
    * corpus/nShards — sized by the caller, not the data.
    */
  def packSequences(docs: DataFrame, budget: Long, nShards: Int,
                    seed: Long = 0L,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy("shard")
      .orderBy(hashStr(col(idCol), seed), col(idCol))
    // explicit ROWS frame: the default RANGE frame treats ORDER BY peers
    // (duplicate ids) as one group, diverging from the oracle's pinned
    // ROWS semantics exactly when the input is dirty
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assignShards(docs, nShards, seed, idCol)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("bin",
        floor((sum(col("n_tokens")).over(wCum) - col("n_tokens")).cast("double") /
          lit(budget.toDouble)).cast("long"))
      .withColumn("pack_order", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("n_tokens"), col("bin"), col("pack_order"))
  }

  /** Strided sequence chunking — fixed-window training-example slicing
    * with overlap (the Hugging Face `return_overflowing_tokens` +
    * `stride` convention): document tokens are cut into windows of
    * `maxLen` tokens whose starts advance by `stride`; consecutive
    * chunks overlap by maxLen − stride tokens so no span longer than the
    * overlap is ever split across an example boundary unseen. The chunk
    * count is 1 + ceil((n − maxLen) / stride) (clamped at 1), so the
    * final window always reaches the document end and no degenerate
    * fully-contained tail chunks are emitted.
    *
    * Scale shape: a pure map over documents (token array bound as an
    * attribute, chunk starts a generated sequence — single-eval, no
    * shuffle); output rows carry (idCol, chunk_idx, n_tokens, chunk).
    */
  def chunkSequences(docs: DataFrame, maxLen: Int, stride: Int,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxLen >= 1, "maxLen must be positive")
    require(stride >= 1 && stride <= maxLen, "stride must be in [1, maxLen]")
    val toks = TextAnalysis.tokens(col(textCol))
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__t", toks)
      .withColumn("__nc",
        when(size(col("__t")) <= maxLen, lit(1L))
          .otherwise(lit(1L) +
            floor((size(col("__t")) - maxLen + stride - 1).cast("long") /
              lit(stride.toLong)).cast("long")))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0L), col("__nc") - 1L)).as("chunk_idx"))
      .withColumn("__chunk",
        slice(col("__t"), (col("chunk_idx") * stride + 1L).cast("int"), lit(maxLen)))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk"))
  }

  /** Source mixing toward target weights: the LARGEST deterministic
    * sub-corpus whose expected composition matches `weights` — the
    * binding source (smallest n_s/w_s) is kept whole and every other
    * source is down-sampled to match:
    *
    *   C = min_s n_s / w_s,   keep fraction f_s = C * w_s / n_s  (<= 1)
    *
    * Sources not in `weights` are dropped. One dimension-scale aggregate
    * (per-source counts) and a broadcast join carry the fractions back;
    * the corpus itself only streams through the final map-side filter —
    * no driver-side collect, no shuffle of the data.
    */
  def mixture(docs: DataFrame, weights: Map[String, Double],
              stratumCol: String = "source", seed: Long = 42L,
              idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "weights must be positive")
    val wmap = map(weights.toSeq.flatMap { case (k, w) =>
      Seq(lit(k), lit(w))
    }: _*)
    val perSource = docs
      .groupBy(stratumCol).agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", element_at(wmap, col(stratumCol)))
      .where(col("__w").isNotNull)
    applyMixture(docs, perSource, stratumCol, seed, idCol)
  }

  /** Shared mixture core: `perSource` carries (stratumCol, __n double,
    * __w double); keep fraction f_s = C·w_s/n_s with C = min(n/w), the
    * binding source kept whole.
    */
  private def applyMixture(docs: DataFrame, perSource: DataFrame,
                           stratumCol: String, seed: Long, idCol: String): DataFrame = {
    val c = perSource.agg(min(col("__n") / col("__w")).as("__c"))
    val fractions = perSource.crossJoin(broadcast(c))
      // *2^24 is exact in doubles (power-of-two scale), so the only
      // roundings are the two divisions and one product — identical IEEE
      // ops in any engine. The binding source (n/w == C) gets the full
      // hash space EXPLICITLY: the (n/w)*w/n round-trip can land 1 ulp
      // below 1.0 and floor to 2^24 - 1, silently dropping ~2^-24 of the
      // one source the contract says is kept whole.
      .select(col(stratumCol),
        when(col("__n") / col("__w") === col("__c"), lit(HashSpace))
          .otherwise(
            floor(col("__c") * col("__w") / col("__n") * HashSpace.toDouble)
              .cast("long"))
          .as("__thr"))
    docs.join(broadcast(fractions), Seq(stratumCol))
      .where(inclusionHash(col(idCol), seed) < col("__thr"))
      .drop("__thr")
  }

  /** Temperature (α-power) source weights — the multilingual sampling
    * rule of Arivazhagan et al. 2019 / mT5 (Xue et al. 2021): sample
    * source s proportionally to n_s^alpha. alpha = 1 is proportional
    * (no rebalance), alpha → 0 approaches uniform; published pipelines
    * use 0.2–0.7 to lift low-resource sources. Output: (stratumCol,
    * n_docs, weight_micro) with weight_micro = round(n^alpha · 1e6) —
    * unnormalized (the mixture formula is scale-invariant in w).
    *
    * Scale shape: one dimension-scale count aggregate; pow runs on the
    * per-SOURCE table only. Cross-engine note: pow is libm-backed with
    * the same ~1-ulp slack as quantLog; alpha = 0.5 routes through
    * correctly-rounded sqrt, which the oracle row pins.
    */
  def temperatureWeights(docs: DataFrame, alpha: Double,
                         stratumCol: String = "source"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    docs.groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_micro",
        floor(pow(col("n_docs").cast("double"), lit(alpha)) * 1e6 + 0.5)
          .cast("long"))
  }

  /** Temperature-rebalanced deterministic sub-corpus: [[mixture]] whose
    * target weights are n_s^alpha computed FROM the data — the largest
    * corpus whose composition matches the temperature distribution; the
    * binding source (always the smallest after flattening) is kept
    * whole. Same scale shape as [[mixture]]: dimension-scale aggregate +
    * broadcast thresholds; the corpus streams through one map filter.
    */
  def temperatureMixture(docs: DataFrame, alpha: Double, seed: Long = 42L,
                         stratumCol: String = "source",
                         idCol: String = "doc_id"): DataFrame = {
    val perSource = temperatureWeights(docs, alpha, stratumCol)
      .select(col(stratumCol), col("n_docs").cast("double").as("__n"),
        col("weight_micro").cast("double").as("__w"))
    applyMixture(docs, perSource, stratumCol, seed, idCol)
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a total token budget across languages so no
    * language repeats more than `maxEpochs` times and the budget left
    * after capping low-resource languages is shared uniformly among the
    * rest. The paper's greedy (visit languages by ascending size, give
    * each min(capacity, uniform share of what remains)) is water-filling,
    * computed here in closed form: ranked by ascending capacity
    * c = n_tokens·maxEpochs, a language is capped iff
    * c·(k − rank + 1) <= budget − (cumulative smaller capacities) — the
    * predicate is monotone in rank, so the capped set is a prefix and the
    * per-rank test with full-capacity prefix sums reproduces the greedy
    * exactly; every uncapped language gets the same water level
    * theta = (budget − capped spend) div (uncapped count).
    *
    * All arithmetic is 64-bit integer (the cap test is the
    * multiplied-out inequality), so any engine reproduces the allocation
    * bit-for-bit; the <= k-token remainder of the final integer division
    * is the only deviation from the paper's real-valued split.
    * epochs_milli = alloc·1000 div n_tokens stays exact up to ~9e15
    * tokens per language — beyond a 100 TB corpus.
    *
    * Scale shape: one (lang) partial aggregate over token counts — the
    * corpus streams through a map + combine; everything downstream runs
    * on the per-LANGUAGE table (hundreds of rows at web scale), where
    * the single ordered window and broadcast totals are dimension-scale
    * by construction, never touched by corpus size.
    */
  def unimaxAllocation(docs: DataFrame, totalBudget: Long, maxEpochs: Int,
                       langCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val perLang = docs
      .groupBy(langCol)
      .agg(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * maxEpochs)
    val w = Window.orderBy(col("capacity").asc, col(langCol).asc)
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = perLang.agg(count(lit(1)).as("__k"))
    val ranked = perLang.crossJoin(broadcast(k))
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__cum_prev", sum(col("capacity")).over(wCum) - col("capacity"))
      .withColumn("__capped",
        col("capacity") * (col("__k") - col("__i") + 1L) <=
          lit(totalBudget) - col("__cum_prev"))
    val fill = ranked.agg(
      sum(when(col("__capped"), col("capacity")).otherwise(0L)).as("__capped_sum"),
      sum(when(col("__capped"), 0L).otherwise(1L)).as("__n_uncapped"))
    ranked.crossJoin(broadcast(fill))
      .withColumn("__budget", lit(totalBudget))
      // CASE short-circuits, so the integer division never sees
      // __n_uncapped = 0: when every language is capped the otherwise
      // branch is dead on every row
      .withColumn("alloc_tokens",
        when(col("__capped"), col("capacity"))
          .otherwise(expr("(__budget - __capped_sum) div __n_uncapped")))
      .withColumn("epochs_milli",
        when(col("n_tokens") > 0L, expr("(alloc_tokens * 1000) div n_tokens"))
          .otherwise(lit(0L)))
      .select(col(langCol), col("n_tokens"), col("capacity"),
        col("alloc_tokens"), col("epochs_milli"))
  }

  /** Token-budget selection: per stratum, keep documents in ascending
    * `orderCol` order while the running token total stays within
    * `budget`. Exact prefix semantics require an ordered scan per
    * stratum — that is a per-source sort (Window), fine when strata fit a
    * partition's sort spill budget. For a 100 TB corpus use
    * [[tokenBudgetApprox]]: no sort, no window, expected-mass semantics.
    */
  def tokenBudget(docs: DataFrame, budget: Long,
                  stratumCol: String = "source", orderCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(orderCol)
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__tok", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .where(col("__cum") <= budget)
      .drop("__tok", "__cum")
  }

  /** Scalable twin of [[tokenBudget]]: keep a deterministic hash-sample of
    * each stratum sized so its EXPECTED token mass equals the budget
    * (fraction = budget / total stratum tokens) — one aggregate plus a
    * map filter, no per-stratum sort. The trade: membership is exact and
    * reproducible, the token total is within sampling error of the
    * budget rather than an exact prefix.
    */
  def tokenBudgetApprox(docs: DataFrame, budget: Long,
                        stratumCol: String = "source", seed: Long = 42L,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val totals = graft.core.Parallelism.widenForCpu(docs)
      .groupBy(stratumCol)
      .agg(sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
        .cast("double").as("__total"))
      .select(col(stratumCol),
        floor(least(lit(1.0), lit(budget.toDouble) / col("__total"))
          * HashSpace.toDouble).cast("long").as("__thr"))
    docs.join(broadcast(totals), Seq(stratumCol))
      .where(inclusionHash(col(idCol), seed) < col("__thr"))
      .drop("__thr")
  }
}
