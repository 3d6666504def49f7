package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the "fastText classifier"
  * stage of published LLM data pipelines (CCNet, LLaMA, GPT-3 all score
  * web documents with a linear text classifier trained on a trusted
  * corpus vs. raw crawl). Heuristic rules ([[QualityRules]]) seed the
  * labels; this naive-Bayes token model GENERALIZES them: a document
  * with no tripped rule but bad-corpus vocabulary still scores low.
  *
  * The model is a token -> log-odds table (Laplace-smoothed naive Bayes
  * with binary classes); a document's score is the mean log-odds of its
  * tokens. Log-odds are quantized to integer MICRO-units
  * (floor(ln(p)·1e6 + 0.5), same scheme as the quantized TF-IDF twin) so
  * scoring is exact integer arithmetic any engine reproduces — the one
  * ln() per vocab term is the only floating-point step.
  *
  * Scale shape (100 TB lens): training is ONE (token) shuffle with
  * map-side combine plus a broadcast 1-row totals frame — no driver
  * action. Scoring joins exploded tokens against the vocab (prune with
  * [[pruneVocab]] to make it broadcast-size: |log-odds| ranks exactly
  * the most discriminative terms) and partial-aggregates per document.
  * Corpus text is never shuffled; token rows carry (id, 8-byte hash).
  */
object QualityClassifier {

  private val Micro = 1000000.0

  /** floor(ln(x)·1e6 + 0.5) as a long — integer micro-log units (shared
    * with [[LanguageModel]]).
    */
  private[datapipe] def quantLog(x: Column): Column =
    floor(log(x) * Micro + lit(0.5)).cast("long")

  /** Train the token log-odds vocabulary from labeled documents.
    * `labelCol` is boolean-castable (true = good). Output: (token,
    * n_good, n_bad, log_odds_micro) with
    * log_odds = ln((n_good+1)/(G+V)) - ln((n_bad+1)/(B+V)), G/B the
    * class token totals and V the vocab size (Laplace smoothing).
    */
  def train(labeled: DataFrame, textCol: String = "text",
            labelCol: String = "label"): DataFrame = {
    val toks = graft.core.Parallelism.widenForCpu(labeled)
      .select(col(labelCol).cast("boolean").as("__good"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
    val counts = toks.groupBy("token").agg(
      sum(when(col("__good"), 1L).otherwise(0L)).as("n_good"),
      sum(when(!col("__good"), 1L).otherwise(0L)).as("n_bad"))
    // class totals as a broadcast 1-row frame, not a driver count() —
    // the whole train is one lazy plan
    val totals = counts.agg(
      sum("n_good").as("__g"), sum("n_bad").as("__b"),
      count(lit(1)).as("__v"))
    counts.crossJoin(broadcast(totals))
      .select(col("token"), col("n_good"), col("n_bad"),
        (quantLog((col("n_good") + 1L).cast("double") /
            (col("__g") + col("__v")).cast("double")) -
          quantLog((col("n_bad") + 1L).cast("double") /
            (col("__b") + col("__v")).cast("double"))).as("log_odds_micro"))
  }

  /** Keep the `topN` most discriminative terms (largest |log-odds|,
    * token tie-break) — the broadcastable production vocabulary.
    */
  def pruneVocab(vocab: DataFrame, topN: Int): DataFrame =
    vocab.orderBy(abs(col("log_odds_micro")).desc, col("token")).limit(topN)

  /** Score documents against a trained vocabulary: per document, the sum
    * and floor-mean of its tokens' log-odds micro-units (out-of-vocab
    * tokens contribute 0) and the predicted label (mean > 0). Documents
    * whose text tokenizes to nothing produce no row.
    */
  def score(docs: DataFrame, vocab: DataFrame,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .join(vocab.select(col("token"), col("log_odds_micro")), Seq("token"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("log_odds_micro"), lit(0L))).as("sum_log_odds_micro"))
      .withColumn("mean_log_odds_micro",
        floor(col("sum_log_odds_micro").cast("double") /
          col("n_tokens").cast("double")).cast("long"))
      .withColumn("predicted_good",
        when(col("mean_log_odds_micro") > 0L, 1L).otherwise(0L))

  /** Rules-seeded end-to-end: label the corpus with [[QualityRules]]
    * (kept = good), train, optionally prune, and score every document.
    */
  def trainAndScore(docs: DataFrame, cfg: QualityRules.Config = QualityRules.Config(),
                    topN: Option[Int] = None,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val labeled = QualityRules.annotate(docs, cfg, textCol)
      .select(col(idCol), col(textCol),
        (size(col("failed_rules")) === 0).as("label"))
    val vocab0 = train(labeled, textCol)
    val vocab = topN.map(pruneVocab(vocab0, _)).getOrElse(vocab0)
    score(docs, vocab, textCol, idCol)
  }
}
