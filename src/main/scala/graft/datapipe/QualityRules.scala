package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-quality filter ruleset for training-data curation — the
  * heuristic keep/drop stage every published corpus pipeline runs before
  * dedup (C4's length/symbol filters, Gopher's token-length and
  * repetition bounds). Same shape as the bar-data `validate.RuleSet`:
  * named column predicates over precomputed metrics, assembled into a
  * reasons array, so one scan annotates, splits, or summarizes.
  *
  * Scale shape: [[withMetrics]] tokenizes ONCE into an intermediate
  * column and derives every metric from it (higher-order functions are
  * interpreted and re-evaluated per reference — the langId lesson), so
  * annotation is a pure map over the documents table; [[summary]] adds a
  * single all-partial aggregate. No shuffle of document text, ever.
  */
object QualityRules {

  /** Thresholds, defaulted to the published heuristic ranges (Gopher
    * token-count and mean-word-length bounds, C4-style symbol and
    * repetition caps) scaled to short synthetic fixtures.
    *
    * `stopwords` backs the prose-likeness rule and is LANGUAGE-SPECIFIC
    * (default: the English marker list) — a multilingual corpus must
    * supply the union of its languages' lists or nearly every non-English
    * document fails `low_stopword_ratio`.
    */
  case class Config(
      minTokens: Long = 20L,
      maxTokens: Long = 100000L,
      meanTokenLenMin: Double = 3.0,
      meanTokenLenMax: Double = 10.0,
      minStopwordRatio: Double = 0.02,
      maxSymbolRatio: Double = 0.10,
      maxDupTokenRatio: Double = 0.55,
      maxDupLineRatio: Double = 0.30,
      minAlphaTokenRatio: Double = 0.80,
      stopwords: Seq[String] = TextAnalysis.markers("en"))

  /** Attach the per-document metric columns the rules test. All counts
    * come from ONE native single-pass expression
    * ([[graft.functions.TextStats]] — whole-stage codegen, no
    * interpreted higher-order passes); every ratio is the same exact
    * integer-count division it always was, so any engine reproduces the
    * doubles bit-for-bit (TextStatsSpec pins every column against the
    * declarative twin below).
    */
  def withMetrics(docs: DataFrame, textCol: String = "text",
                  stopwords: Seq[String] = TextAnalysis.markers("en")): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val st = col("__st")
    def f(name: String) = st.getField(name)
    val n = f("n_tokens").cast("double")
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__st",
        call_function(graft.functions.GraftFunctions.textStatsName,
          col(textCol),
          // typedLit, not array(map(lit)): an empty stopword list would
          // otherwise build array() : array<null>, which TextStats's
          // foldable-array<string> input check rejects at analysis time
          typedLit(stopwords.toArray)))
      .withColumn("n_tokens", f("n_tokens"))
      .withColumn("mean_token_len", f("sum_token_len").cast("double") / n)
      .withColumn("stopword_ratio", f("n_stopword").cast("double") / n)
      .withColumn("symbol_ratio", f("n_symbol").cast("double") /
        greatest(f("text_len"), lit(1L)).cast("double"))
      .withColumn("alpha_token_ratio", f("n_alpha").cast("double") / n)
      .withColumn("dup_token_ratio",
        lit(1.0) - f("n_distinct_tokens").cast("double") / n)
      .withColumn("dup_line_ratio",
        lit(1.0) - f("n_distinct_lines").cast("double") /
          f("n_lines").cast("double"))
      .drop("__st")
  }

  /** The declarative higher-order-function twin of [[withMetrics]] —
    * retained as the executable specification the native expression is
    * property-pinned against (TextStatsSpec), and as the portable
    * formulation an engine without custom expressions would run.
    */
  private[graft] def withMetricsDeclarative(
      docs: DataFrame, textCol: String = "text",
      stopwords: Seq[String] = TextAnalysis.markers("en")): DataFrame = {
    val t = col("__toks")
    val n = col("n_tokens").cast("double")
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__lines",
        org.apache.spark.sql.functions.split(col(textCol), "\n"))
      .withColumn("n_tokens", size(t).cast("long"))
      // true mean of token lengths (sum of lengths / n), not the
      // separator-count approximation — runs of spaces/tabs/CRLF between
      // tokens don't inflate it
      .withColumn("mean_token_len",
        aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .cast("double") / n)
      .withColumn("stopword_ratio",
        size(filter(t, x => x.isin(stopwords.map(lit): _*)))
          .cast("double") / n)
      // greatest(len,1) guards the empty-document 0/0 (NaN vs
      // engine-dependent in SQL); an empty doc scores 0.0 deterministically
      // single-char class: the match count equals the length delta under
      // regexp_replace-to-empty, which skips regexp_extract_all's
      // per-match string allocation (one UTF8String per symbol char)
      .withColumn("symbol_ratio",
        (length(col(textCol)) - length(regexp_replace(col(textCol),
            s"[^A-Za-z0-9${TextAnalysis.wsClass}]", "")))
          .cast("double") / greatest(length(col(textCol)), lit(1)).cast("double"))
      .withColumn("alpha_token_ratio",
        size(filter(t, x => x.rlike("[a-z]"))).cast("double") / n)
      .withColumn("dup_token_ratio",
        lit(1.0) - size(array_distinct(t)).cast("double") / n)
      .withColumn("dup_line_ratio",
        lit(1.0) - size(array_distinct(col("__lines"))).cast("double") /
          size(col("__lines")).cast("double"))
      .drop("__toks", "__lines")
  }

  /** reason -> predicate over a [[withMetrics]]-annotated row. */
  def rules(cfg: Config = Config()): Seq[(String, Column)] = Seq(
    "too_few_tokens" -> (col("n_tokens") < cfg.minTokens),
    "too_many_tokens" -> (col("n_tokens") > cfg.maxTokens),
    "mean_token_len_out_of_range" ->
      !col("mean_token_len").between(cfg.meanTokenLenMin, cfg.meanTokenLenMax),
    "low_stopword_ratio" -> (col("stopword_ratio") < cfg.minStopwordRatio),
    "high_symbol_ratio" -> (col("symbol_ratio") > cfg.maxSymbolRatio),
    "high_dup_token_ratio" -> (col("dup_token_ratio") > cfg.maxDupTokenRatio),
    "high_dup_line_ratio" -> (col("dup_line_ratio") > cfg.maxDupLineRatio),
    "low_alpha_token_ratio" ->
      (col("alpha_token_ratio") < cfg.minAlphaTokenRatio)
  )

  /** Annotate each document with the array of failed rule names (empty =
    * keep). Pure map; the metrics columns stay attached for inspection.
    */
  def annotate(docs: DataFrame, cfg: Config = Config(),
               textCol: String = "text"): DataFrame = {
    val reasons = array(rules(cfg).map { case (name, pred) =>
      when(pred, lit(name)).otherwise(lit(null).cast("string"))
    }: _*)
    withMetrics(docs, textCol, cfg.stopwords)
      .withColumn("failed_rules", filter(reasons, _.isNotNull))
  }

  /** Kept documents only — [[annotate]] filtered to the rows failing no
    * rule. The keep-predicate is wrapped in
    * [[graft.functions.PushdownBarrier]]: pushed below the metric
    * projection, the optimizer's alias substitution would plant one
    * [[graft.functions.TextStats]] copy per metric reference into a
    * FilterExec (which does no subexpression elimination) and
    * re-traverse every document ~9× before the projection runs —
    * measured 3.4 s vs 761.7 s at sf10 on the same lineage
    * (tools/ProfLmBuild; SCALE.md round-10c).
    */
  def kept(docs: DataFrame, cfg: Config = Config(),
           textCol: String = "text"): DataFrame =
    annotate(docs, cfg, textCol)
      .where(graft.functions.PushdownBarrier.fence(
        size(col("failed_rules")) === 0))
      .drop("failed_rules")

  /** Split into (kept, dropped): dropped rows carry `failed_rules`. Both
    * sides derive from one annotated plan — with `frontier = true` the
    * annotated frame is materialized once (parquet scratch) so the two
    * sides don't re-scan/re-tokenize the input; leave it false when only
    * one side is consumed or the input is cheap to recompute. Both
    * filters ride the [[kept]] pushdown fence.
    */
  def split(docs: DataFrame, cfg: Config = Config(),
            textCol: String = "text",
            frontier: Boolean = false): (DataFrame, DataFrame) = {
    val annotated0 = annotate(docs, cfg, textCol)
    val annotated =
      if (frontier) graft.core.Materialize.frontier(annotated0) else annotated0
    (annotated.where(graft.functions.PushdownBarrier.fence(
        size(col("failed_rules")) === 0))
       .drop("failed_rules"),
     annotated.where(graft.functions.PushdownBarrier.fence(
        size(col("failed_rules")) > 0)))
  }

  /** One-row corpus summary: per-rule failure counts plus kept/total —
    * the monitoring surface for a filter sweep. Single all-partial
    * aggregate (map-side combine; one row crosses the exchange).
    */
  def summary(docs: DataFrame, cfg: Config = Config(),
              textCol: String = "text"): DataFrame = {
    val rs = rules(cfg)
    val anyFail = rs.map(_._2).reduce(_ || _)
    val perRule = rs.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    val totals = Seq(
      sum(when(!coalesce(anyFail, lit(false)), 1L).otherwise(0L)).as("n_kept"),
      count(lit(1)).as("n_total"))
    withMetrics(docs, textCol, cfg.stopwords)
      .agg(perRule.head, (perRule.tail ++ totals): _*)
  }
}
