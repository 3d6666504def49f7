package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, token counting, quality scoring, language identification,
  * document fingerprinting.
  *
  * All column-expression compositions (codegen-friendly, no UDFs), so each
  * scales as a pure map over the documents table — no shuffle at all until
  * a downstream groupBy.
  */
object TextAnalysis {

  /** Whitespace class used by every tokenizing regex, written out
    * explicitly instead of `\s`: Java's `\s` includes vertical tab \x0B,
    * RE2-family engines' (the DuckDB oracle's) does not — the explicit
    * class pins identical semantics in both.
    */
  val wsClass = " \\t\\n\\r\\f"

  /** Whitespace tokenization of normalized text. */
  def tokens(text: Column): Column = split(lower(trim(text)), s"[$wsClass]+")

  /** Adjacent-element pairs of an array as array<struct<a, b>> — the
    * shared bigram/symbol-pair idiom ([[LanguageModel]] token bigrams,
    * [[Dsir]] hashed bigram features, [[Bpe]] merge statistics). `arr`
    * MUST be bound as an attribute (not a nested expression) — the
    * lambda references it per element, the HOF re-eval trap — and the
    * caller guards size >= 2 (sequence(1, 0) descends, it is not empty).
    */
  def adjacentPairs(arr: Column): Column =
    transform(sequence(lit(1), size(arr) - 1), i =>
      struct(element_at(arr, i).as("a"), element_at(arr, i + 1).as("b")))

  /** Token count: whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: greedy chunks of <=4 letters, digit
    * runs, or single non-alnum symbols — a cheap deterministic proxy for
    * subword-model token counts (budgeting, not exact tokenization).
    */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(s"[a-z]{1,4}|[0-9]+|[^a-z0-9$wsClass]"), lit(0)))

  /** Marker stopwords per language for the n-gram/stopword langid
    * heuristic. Tiny on purpose: broadcast as literals into codegen.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "es" -> Seq("el", "la", "los", "y", "de"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2")
  )

  /** Integer marker-hit score for one language. */
  def langScore(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(markers(lang).map(lit): _*)))

  /** Predicted language: highest marker score, fixed-order tie-break
    * (en, de, es, fr, zh; `array_position` returns the FIRST max).
    *
    * Shape matters at scale: higher-order functions (`filter`) are not
    * codegen'd, and column expressions are re-evaluated per reference — a
    * per-language CASE chain comparing each score against a greatest(...)
    * of all five re-tokenized the text ~35x per row (measured 17 s for
    * 50k docs at the sf1 rehearsal, scaling with that constant). Scoring
    * into ONE array and picking argmax evaluates the tokenization a
    * bounded ~3x instead; same result bit-for-bit.
    */
  def langId(text: Column): Column = {
    val order = Seq("en", "de", "es", "fr", "zh")
    val toks = tokens(text)
    val scores = array(order.map(l =>
      size(filter(toks, t => t.isin(markers(l).map(lit): _*)))): _*)
    val best = array_max(scores)
    when(best > 0,
        element_at(lit(order.toArray), array_position(scores, best).cast("int")))
      .otherwise(lit("unknown"))
  }

  /** Quality metrics: char/token counts, mean token length, unique-token
    * ratio, stopword ratio, short-token ratio. All exact-integer ratios
    * (deterministic doubles).
    *
    * Tokenization lands in ONE intermediate column first: the same
    * per-reference re-evaluation that bit `langId` (split is non-cheap and
    * the filter HOFs are interpreted, so referencing the expression in six
    * derived columns would tokenize six times per row; CollapseProject
    * does not inline a non-cheap alias with multiple references).
    */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col("__toks")
    val n = col("n_tokens").cast("double")
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_unique_tokens", size(array_distinct(t)).cast("long"))
      .withColumn("unique_ratio", col("n_unique_tokens").cast("double") / n)
      .withColumn("stopword_ratio",
        size(filter(t, x => x.isin(markers("en").map(lit): _*))).cast("double") / n)
      .withColumn("short_token_ratio",
        size(filter(t, x => length(x) <= 2)).cast("double") / n)
      .withColumn("mean_token_len",
        (length(trim(col(textCol))) - (col("n_tokens") - 1)).cast("double") / n)
      .drop("__toks")
  }

  /** Composite quality score in [0,1]: penalize degenerate repetition and
    * extreme token lengths; reward stopword presence (prose-likeness).
    */
  def qualityScore: Column =
    least(lit(1.0), greatest(lit(0.0),
      col("unique_ratio") * 0.5 +
        least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3 +
        when(col("mean_token_len").between(3.0, 10.0), 0.2).otherwise(0.0)))

  /** PII patterns chosen to evaluate identically under Java regex and
    * RE2-style engines (no backreferences, no lookaround): email, URL,
    * international phone (+digits form).
    */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlRe = s"https?://[^$wsClass]+"
  val phoneRe = "\\+[0-9]{7,15}"

  /** Per-document PII hit counts — pure map, codegen'd. */
  def withPiiCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_urls", size(regexp_extract_all(col(textCol), lit(urlRe), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(phoneRe), lit(0))).cast("long"))

  /** PII redaction: emails/URLs/phones replaced with typed tags — the
    * scrub step of a training-data pipeline. Order matters (emails before
    * URLs would break mailto-in-URL cases; URLs first is canonical).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** Repetition metrics: duplicated-token ratio (1 - distinct/total) and
    * duplicated-line ratio — degenerate-document detectors. Per-row
    * arithmetic only: deterministic doubles, no cross-row FP.
    */
  def withRepetition(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__lines", split(col(textCol), "\\n"))
      .withColumn("dup_token_ratio",
        lit(1.0) - size(array_distinct(col("__toks"))).cast("double") /
          size(col("__toks")).cast("double"))
      .withColumn("dup_line_ratio",
        lit(1.0) - size(array_distinct(col("__lines"))).cast("double") /
          size(col("__lines")).cast("double"))
      .drop("__toks", "__lines")

  /** Duplicated word-n-gram ratio (Gopher's third repetition signal,
    * alongside the token and line ratios of [[withRepetition]]): the
    * fraction of a document's n-gram occurrences that are repeats,
    * 1 - distinct/total over the in-row shingle multiset. Documents with
    * < n tokens score 0.0. A map over the documents table, no shuffle;
    * the n-gram array lives and dies inside the row.
    *
    * DataFrame-shaped on purpose: the n-gram lambda must index an
    * ATTRIBUTE (`__toks`, one tokenization per row), not the tokens
    * expression — referencing `tokens(text)` inside the transform
    * re-tokenizes once per n-gram element, O(tokens²) per document (the
    * langId lesson; measured 648 s vs ~3 s for the sf1 corpus).
    *
    * The n-gram multiset is HASHED ([[graft.functions.GramHashes]], one
    * native pass, no gram-string allocation): distinct-over-64-bit-
    * fingerprints equals distinct-over-gram-strings absent an
    * in-document collision (~grams²/2⁶⁵ per doc, ~1e-14 at 1k-gram
    * docs — the accepted-collision contract of every hashed-fingerprint
    * operator here), so the string-built oracle stays exact.
    */
  def withDupNgramRatio(docs: DataFrame, n: Int = 5,
                        textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val t = col("__toks")
    // the n-gram array is ALSO bound (`__ng`): the ratio references it
    // twice (distinct size / total size), and an inline call would
    // build it twice per row. GramHashes returns empty for < n tokens,
    // short-circuiting short docs to ratio 0.0 below.
    val ng = call_function(graft.functions.GraftFunctions.gramHashesName,
      t, lit(n), lit(0L))
    graft.core.Parallelism.widenForCpu(docs)
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__ng", ng)
      .withColumn("dup_ngram_ratio",
        when(size(col("__ng")) > 0,
            lit(1.0) - size(array_distinct(col("__ng"))).cast("double") /
              size(col("__ng")).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__toks", "__ng")
  }

  /** Per-document Shannon entropy of the token distribution, in floored
    * micro-nats — the token-diversity quality signal (low entropy =
    * repetitive machine junk; keyword-stuffed spam scores near zero even
    * when raw dup-token ratio is modest). The one aggregation-shaped
    * signal in this file: (id, token) counts then a per-document fold,
    * both partial-aggregating shuffles.
    *
    * Engine-exact integer pipeline: entropy = ln N - (Σ n·ln n)/N is a
    * SUM of doubles, and float addition is order-dependent — a naive
    * double sum can differ in the last ulp between engines/partitionings.
    * Each n·ln n term is floored to micro-nats FIRST (deterministic per
    * (n) value), the sum is a long, and the final division is floored —
    * every cross-engine operation is integer-exact. (The residual
    * exposure is libm's ~1-ulp ln() slack landing a term exactly on a
    * .5 boundary — the same accepted slack as [[QualityClassifier]]'s
    * quantLog.)
    */
  def tokenEntropy(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val micro = lit(1000000.0)
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__n"))
      .groupBy(idCol).agg(
        sum(col("__n")).as("__total"),
        sum(floor(col("__n").cast("double") * log(col("__n").cast("double")) * micro
          + 0.5).cast("long")).as("__s_micro"))
      .select(col(idCol),
        (floor(log(col("__total").cast("double")) * micro + 0.5).cast("long")
          - floor(col("__s_micro").cast("double") / col("__total").cast("double"))
            .cast("long")).as("entropy_micro"))
  }

  /** Stable content fingerprint (md5 of normalized text) for exact dedup
    * and change detection.
    */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** 64-bit fingerprint via xxhash64 — cheaper join key than the md5
    * string at 100 TB (8 bytes vs 32).
    */
  def fingerprint64(text: Column): Column = xxhash64(lower(trim(text)))
}
