package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the "perplexity filter" stage of
  * published LLM pipelines (CCNet/LLaMA score crawl documents with a
  * KenLM trained on a trusted corpus and drop the high-perplexity tail).
  * Here: a bigram model with Laplace smoothing, trained on the trusted
  * slice (e.g. the [[QualityRules]]-kept documents), scoring every
  * document by its mean token log-probability
  * ln p(w_i | w_{i-1}) = ln((c(w1,w2)+1)/(c(w1)+V)).
  *
  * Log-probs are quantized to integer MICRO-nat units (the
  * [[QualityClassifier]] scheme), so document scores are exact integer
  * sums any engine reproduces; "perplexity" is exp(-mean/1e6) if a
  * caller wants the conventional form.
  *
  * Scale shape (100 TB lens): training is two (token)- and
  * (w1,w2)-keyed shuffles with map-side combine — counts, never text.
  * Scoring explodes documents into (id, w1, w2) rows and joins the two
  * count tables (prune with [[pruneModel]] to make them broadcast-size;
  * unseen n-grams back off to the smoothing floor, so pruning degrades
  * gracefully), then one (id) partial aggregate. The vocabulary size V
  * rides along as a broadcast 1-row frame — no driver action anywhere.
  */
object LanguageModel {

  /** (id, w1, w2) consecutive-token pairs; documents with < 2 tokens
    * produce no rows (a bigram model cannot score them).
    */
  private def bigramPairs(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(TextAnalysis.adjacentPairs(col("__t"))).as("p"))
      .select(col(idCol), col("p.a").as("w1"), col("p.b").as("w2"))

  /** Unigram counts over the training slice: (token, n_w). */
  def unigramCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_w"))

  /** Bigram counts over the training slice: (w1, w2, n_bg). */
  def bigramCounts(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    bigramPairs(docs, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_bg"))

  /** Keep the `topN` most frequent rows of a count table — the
    * broadcastable production model (count desc, key tie-break).
    *
    * Pruning the two tables independently can leave a surviving bigram
    * whose w1 unigram was pruned: its n_w resolves to 0 at scoring time
    * while n_bg may exceed V, which would make the smoothed ratio > 1.
    * [[score]] clamps the ratio at 1.0, so inconsistent pruning degrades
    * to a 0-logp bigram instead of a positive "probability".
    */
  def pruneModel(counts: DataFrame, topN: Int): DataFrame = {
    val key = counts.columns.filter(_ != "n_w").filter(_ != "n_bg").map(col)
    val n = if (counts.columns.contains("n_bg")) col("n_bg") else col("n_w")
    counts.orderBy((n.desc +: key.map(_.asc)): _*).limit(topN)
  }

  /** Score documents against trained unigram/bigram counts: per document
    * the bigram count, the summed quantized ln p(w2|w1), and its floor
    * mean (micro-nats; higher = more fluent under the model). Documents
    * with < 2 tokens produce no row.
    */
  def score(docs: DataFrame, unigrams: DataFrame, bigrams: DataFrame,
            textCol: String = "text", idCol: String = "doc_id",
            vocabSize: Option[DataFrame] = None): DataFrame = {
    // V as a broadcast 1-row frame: Laplace denominator c(w1)+V. A
    // caller contrasting two models passes a SHARED `__v` frame so both
    // sides smooth over the same vocabulary (see [[crossEntropySelect]]).
    val v = vocabSize.getOrElse(unigrams.agg(count(lit(1)).as("__v")))
    bigramPairs(docs, textCol, idCol)
      .join(bigrams.select(col("w1"), col("w2"), col("n_bg")), Seq("w1", "w2"), "left")
      .join(unigrams.select(col("token").as("w1"), col("n_w")), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      // least(1.0, ·): a probability can only exceed 1 when the two count
      // tables are inconsistently pruned (bigram kept, its w1 unigram
      // dropped -> n_w=0 with n_bg+1 > V); clamping keeps every logp <= 0
      .withColumn("__logp", QualityClassifier.quantLog(least(lit(1.0),
        (coalesce(col("n_bg"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("n_w"), lit(0L)) + col("__v")).cast("double"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__logp")).as("sum_logp_micro"))
      .withColumn("mean_logp_micro",
        floor(col("sum_logp_micro").cast("double") /
          col("n_bigrams").cast("double")).cast("long"))
  }

  /** Rules-seeded end-to-end: train the bigram model on the
    * [[QualityRules]]-kept slice and score every document.
    *
    * The annotated `good` slice is materialized (Materialize.frontier)
    * because BOTH count tables consume it: left lazy, unigramCounts and
    * bigramCounts each re-run the whole annotate pipeline (tokenize +
    * every metric), tripling the corpus tokenization. Measured r10:
    * sf1 20.5 s → 10.1 s, sf0.1 3.5 s → 2.8 s (median-of-3). An earlier
    * round measured the opposite at sf0.1 — then, the dominant one-shot
    * cost was the codegen compile of the annotate pipeline; with the
    * round-10 tokenization-heavy fixtures and 10× scales the recompute
    * dominates instead, the standard multi-consumer frontier rule
    * ([[Dsir.fitModel]], the pair-graph artifact). A caller scoring
    * MANY candidate batches against one model should still fit once and
    * reuse: `frontier(unigramCounts(good))` / `frontier(bigramCounts
    * (good))`, then [[score]] per batch.
    */
  def trainAndScore(docs: DataFrame, cfg: QualityRules.Config = QualityRules.Config(),
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val (uni, bi) = fitCounts(docs, cfg, textCol, idCol)
    score(docs, uni, bi, textCol, idCol)
  }

  /** Fit the two count tables on the [[QualityRules]]-kept slice of
    * `docs`, sharing ONE materialized pass over the annotated slice
    * (both tables consume it; left lazy each re-runs the whole annotate
    * pipeline). Returned frames are the model: persist them (e.g.
    * `ArtifactStore.getOrBuild`) to score many batches — or several
    * query rows — without re-training, the CCNet shape (the KenLM is
    * trained once, every crawl shard scores against it).
    */
  def fitCounts(docs: DataFrame, cfg: QualityRules.Config = QualityRules.Config(),
                textCol: String = "text", idCol: String = "doc_id"): (DataFrame, DataFrame) = {
    val good = graft.core.Materialize.frontier(
      QualityRules.kept(docs, cfg, textCol)
        .select(col(idCol), col(textCol)))
    (unigramCounts(good, textCol), bigramCounts(good, textCol, idCol))
  }

  /** CCNet-style head/middle/tail perplexity buckets (Wenzek et al.,
    * LREC 2020): per group (CCNet: per language) rank documents by LM
    * score — higher mean log-prob = lower perplexity = more fluent —
    * and split into equal thirds: `head` (most fluent), `middle`,
    * `tail`. CCNet keeps head+middle for pretraining and drops or
    * down-weights the tail; emitting the label (not filtering) lets the
    * caller mix buckets at chosen rates.
    *
    * Bucketing is exact-rank arithmetic (`rank*3 <= n`, ties broken by
    * ascending id), so the labeling is engine-exact — the same
    * exact/approx duality as [[Sampling.tokenBudget]]: this form sorts
    * within each group (one window per group; groups are languages, so
    * partition width is corpus/languages — large but bounded); the
    * 100 TB shortcut is per-group tercile THRESHOLD scores from an
    * approximate-percentile partial aggregate, broadcast back as a map
    * filter, trading exact thirds for no sort.
    */
  def perplexityBuckets(scored: DataFrame, byCol: String,
                        scoreCol: String = "mean_logp_micro",
                        idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(byCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    scored.select(col(idCol), col(byCol), col(scoreCol))
      // row_number is IntegerType: widen before *3 so groups past ~715M
      // rows can't wrap negative (the oracle's row_number is BIGINT)
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(byCol)))
      .withColumn("ppl_bucket",
        when(col("__r") * 3 <= col("__n"), lit("head"))
          .when(col("__r") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(byCol), col(scoreCol), col("ppl_bucket"))
  }

  /** The 100 TB twin of [[perplexityBuckets]]: NO per-group corpus-scale
    * sort. Scores are bucketed into at most `nBins` equal-width integer
    * bins per group (one broadcast min/max/count aggregate decides the
    * width); per-bin counts are cumulated top-down over the ≤`nBins`-row
    * bin table (a metadata-scale window, corpus never sorted) and each
    * BIN gets the tercile label its cumulative rank implies; labels join
    * back broadcast. Three corpus passes, all map-shaped: stats
    * aggregate, bin counts, label join — the scored projection is
    * materialized once ([[graft.core.Materialize.frontier]]) so the
    * upstream scoring lineage isn't re-derived per pass.
    *
    * Approximation contract (deterministic, engine-exact — integer bin
    * arithmetic only, so an oracle reproduces the labeling bit-for-bit):
    * tercile boundaries snap to bin edges — a bin straddling n/3 goes
    * entirely to the lower bucket (inclusive cumulative rule). When every
    * score in a group is distinct and the score range < `nBins`, bins are
    * singletons and the labeling EQUALS the exact variant's (ties are the
    * only other divergence: exact splits them by id, approx labels them
    * alike — pinned by the spec).
    */
  def perplexityBucketsApprox(scored: DataFrame, byCol: String,
                              nBins: Int = 1024,
                              scoreCol: String = "mean_logp_micro",
                              idCol: String = "doc_id"): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    import org.apache.spark.sql.expressions.Window
    val s = graft.core.Materialize.frontier(
      scored.select(col(idCol), col(byCol), col(scoreCol)))
    val stats = s.groupBy(byCol).agg(
      min(col(scoreCol)).as("__lo"), max(col(scoreCol)).as("__hi"),
      count(lit(1)).as("__n"))
    // integer `div` on both operands >= 0: truncation == floor, and both
    // engines compute the identical bin id (no double rounding anywhere)
    val binned = s.join(broadcast(stats), Seq(byCol))
      .withColumn("__bin",
        expr(s"($scoreCol - __lo) div (((__hi - __lo) div $nBins) + 1)"))
    val w = Window.partitionBy(byCol).orderBy(col("__bin").desc)
    val labels = binned.groupBy(col(byCol), col("__bin"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cumtop", sum(col("__c")).over(w))
      .join(broadcast(stats.select(col(byCol), col("__n"))), Seq(byCol))
      .withColumn("ppl_bucket",
        when(col("__cumtop") * 3 <= col("__n"), lit("head"))
          .when(col("__cumtop") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select(col(byCol), col("__bin"), col("ppl_bucket"))
    binned.select(col(idCol), col(byCol), col(scoreCol), col("__bin"))
      .join(broadcast(labels), Seq(byCol, "__bin"))
      .select(col(idCol), col(byCol), col(scoreCol), col("ppl_bucket"))
  }

  /** Moore-Lewis cross-entropy difference selection (Moore & Lewis, ACL
    * 2010) — the classic LM-contrast data-selection step: score every
    * candidate under an in-domain (target) bigram model and a general
    * (source) model, rank by the per-token difference
    * `mean_logp_target − mean_logp_source` (how much more target-like
    * than generic a document is), keep the top `n`. Used to carve
    * domain-targeted training sets out of a general crawl; the same
    * contrast with a pruned model pair is the 100 TB shape
    * ([[pruneModel]] both models, broadcast the count tables).
    *
    * Both models smooth over the SHARED vocabulary (Moore & Lewis's
    * common-vocab convention): with per-model vocabularies an all-OOV
    * document would score ln(1/V_t) − ln(1/V_g) > 0 purely because the
    * in-domain vocabulary is smaller — gibberish would outrank real
    * general-domain text (caught by the spec). Shared V makes an
    * unseen-everywhere bigram contribute exactly 0 contrast.
    *
    * Everything stays in [[score]]'s integer micro-nat quantization, so
    * the ranking — and therefore the selected set — is engine-exact;
    * ties break on ascending id. Scale shape: two count-table scoring
    * passes (text never shuffles; see [[score]]) joined on id, then one
    * TakeOrderedAndProject — no global sort materializes.
    */
  def crossEntropySelect(
      candidates: DataFrame, targetDocs: DataFrame, sourceDocs: DataFrame,
      n: Int, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    crossEntropySelectWith(candidates,
      unigramCounts(targetDocs, textCol),
      bigramCounts(targetDocs, textCol, idCol),
      unigramCounts(sourceDocs, textCol),
      bigramCounts(sourceDocs, textCol, idCol),
      n, textCol, idCol)

  /** [[crossEntropySelect]] against PRE-FIT count tables — the
    * fit-once/score-later production path (persist the four [[
    * unigramCounts]]/[[bigramCounts]] tables, e.g. via `ArtifactStore`,
    * and contrast many candidate batches without re-training). Also the
    * latency-correct shape inline: the target unigram table is consumed
    * by the shared-vocabulary union AND the target scoring pass (the
    * source one likewise), so unmaterialized models re-tokenize each
    * training corpus up to three times inside one plan.
    */
  def crossEntropySelectWith(
      candidates: DataFrame,
      targetUnigrams: DataFrame, targetBigrams: DataFrame,
      sourceUnigrams: DataFrame, sourceBigrams: DataFrame,
      n: Int, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sharedV = targetUnigrams.select("token")
      .union(sourceUnigrams.select("token"))
      .distinct().agg(count(lit(1)).as("__v"))
    // ONE scoring pass for BOTH models (r18; guide §1.2 — two [[score]]
    // calls each re-derived the exploded candidate pairs and shuffled
    // them by (w1, w2) and by (w1) separately, then re-joined the two
    // score tables on id: stage-profiled at sf10 as the two dominant
    // steady-state stages, ~75-98 s task-time EACH, on identical
    // inputs). Joining both models' tables off one pair frame keys the
    // two bigram joins (and the two unigram joins) identically, so each
    // exchange of the pair frame is planned once and both per-model
    // log-probs come out of a single per-doc aggregate — the id-join
    // disappears. Per-model arithmetic is byte-identical to [[score]]
    // (same smoothing, same clamp, same floor-mean), so the selected
    // set and every emitted score match the oracle unchanged.
    val scored = bigramPairs(candidates, textCol, idCol)
      .join(targetBigrams.select(col("w1"), col("w2"), col("n_bg").as("__t_nbg")),
        Seq("w1", "w2"), "left")
      .join(sourceBigrams.select(col("w1"), col("w2"), col("n_bg").as("__s_nbg")),
        Seq("w1", "w2"), "left")
      .join(targetUnigrams.select(col("token").as("w1"), col("n_w").as("__t_nw")),
        Seq("w1"), "left")
      .join(sourceUnigrams.select(col("token").as("w1"), col("n_w").as("__s_nw")),
        Seq("w1"), "left")
      .crossJoin(broadcast(sharedV))
      .withColumn("__t_logp", QualityClassifier.quantLog(least(lit(1.0),
        (coalesce(col("__t_nbg"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("__t_nw"), lit(0L)) + col("__v")).cast("double"))))
      .withColumn("__s_logp", QualityClassifier.quantLog(least(lit(1.0),
        (coalesce(col("__s_nbg"), lit(0L)) + 1L).cast("double") /
          (coalesce(col("__s_nw"), lit(0L)) + col("__v")).cast("double"))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("__n"),
        sum(col("__t_logp")).as("__t_sum"),
        sum(col("__s_logp")).as("__s_sum"))
      .select(col(idCol),
        floor(col("__t_sum").cast("double") / col("__n").cast("double"))
          .cast("long").as("target_logp_micro"),
        floor(col("__s_sum").cast("double") / col("__n").cast("double"))
          .cast("long").as("source_logp_micro"))
    scored
      .withColumn("ml_score_micro",
        col("target_logp_micro") - col("source_logp_micro"))
      .orderBy(desc("ml_score_micro"), col(idCol))
      .limit(n)
  }
}
