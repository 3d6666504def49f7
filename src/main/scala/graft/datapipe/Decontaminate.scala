package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with an evaluation/benchmark set — the published n-gram-overlap
  * decontamination method (13-grams in the original description; `n` is a
  * parameter because short benchmark prompts need smaller windows).
  *
  * Scale shape: both sides shingle in-row ([[Dedup.shingleArrays]]), then
  * ONE inner join keyed on the shingle — shuffle cost is the shingle sets,
  * never |docs| x |benchmark|. The benchmark side is tiny in practice
  * (eval suites are thousands of rows, not billions), so Spark broadcasts
  * it and the training corpus never shuffles at all.
  */
object Decontaminate {

  /** Contaminated (doc, benchmark-overlap) summary: one row per training
    * doc sharing >= `minMatches` distinct n-grams with ANY benchmark row —
    * n_matched_ngrams (distinct shingles hit) and n_benchmarks (distinct
    * benchmark rows hit).
    *
    * Plan shape (single-pass): the contamination join is broadcast
    * map-side, and BOTH distinct counts come from one `collect_set` agg
    * over it — one corpus scan, one exchange keyed on the doc id whose
    * volume is the map-side-deduped matched set (contamination-
    * proportional), no Expand. Two `countDistinct`s in one agg would
    * plan an Expand that doubles every matched row pre-exchange; two
    * separate branches (the pre-r17 shape) re-shingled the whole corpus
    * per branch because a map-side join leaves no exchange to reuse.
    * Per-doc set sizes are bounded: matched shingles by the doc's own
    * length, matched benchmarks by the (broadcast-small) eval suite.
    */
  def contaminated(
      docs: DataFrame, benchmark: DataFrame, n: Int = 13, minMatches: Int = 1,
      textCol: String = "text", idCol: String = "doc_id",
      benchTextCol: String = "text", benchIdCol: String = "bench_id"): DataFrame = {
    val docSh = Dedup.shingles(docs, n, textCol, idCol)
    val benchSh = Dedup.shingles(
        benchmark.withColumnRenamed(benchTextCol, "__btext"),
        n, "__btext", benchIdCol)
      .withColumnRenamed("shingle", "__bshingle")
    val matched = docSh
      .join(broadcast(benchSh), col("shingle") === col("__bshingle"))
      .select(col(idCol), col("shingle"), col(benchIdCol))
    matched.groupBy(idCol)
      .agg(size(collect_set(col("shingle"))).cast("long").as("n_matched_ngrams"),
           size(collect_set(col(benchIdCol))).cast("long").as("n_benchmarks"))
      .where(col("n_matched_ngrams") >= minMatches)
  }

  /** Training rows surviving decontamination (left-anti on the flagged set). */
  def clean(
      docs: DataFrame, benchmark: DataFrame, n: Int = 13, minMatches: Int = 1,
      textCol: String = "text", idCol: String = "doc_id",
      benchTextCol: String = "text", benchIdCol: String = "bench_id"): DataFrame =
    docs.join(
      contaminated(docs, benchmark, n, minMatches, textCol, idCol,
        benchTextCol, benchIdCol).select(idCol),
      Seq(idCol), "left_anti")

  /** Semantic benchmark decontamination — the embedding-space twin of
    * [[contaminated]]: flag every corpus vector whose cosine similarity
    * to ANY benchmark/eval vector reaches `threshold`. Lexical n-gram
    * overlap (the classic method above) misses paraphrased or
    * reformatted eval leakage; embedding similarity catches it — the
    * published complement (e.g. the contamination audits run on modern
    * pretraining corpora score train-vs-eval pairs in embedding space).
    *
    * Output: (idCol, n_bench_hits, max_cosine) for flagged vectors.
    * Benchmark members present in the corpus flag themselves (cosine 1)
    * — they ARE the contamination.
    *
    * Scale shape: the benchmark side is small by nature (eval suites are
    * thousands of rows) → broadcast; the corpus streams map-side through
    * |bench| quantized-integer dot products per row (codegen'd
    * [[Vectors.dotQN]], norms computed once per side), and only flagged
    * pairs reach the (id) partial agg. The corpus itself never
    * shuffles. For a benchmark side too big to broadcast, assign BOTH
    * sides to trained IVF centroids ([[Similarity.ivfTrain]] /
    * `ivfAssignIds`) and run this per cluster — same recall trade as any
    * ANN probe.
    *
    * Determinism: quantized dots are exact integers; cosine = intdot /
    * (sqrt·sqrt) over identical values in any engine, so `max_cosine`
    * is reproducible bit-for-bit (the sim1 discipline).
    */
  def semanticContaminated(
      vecs: DataFrame, benchmark: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      benchIdCol: String = "bench_id", benchVecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    val corpus = vecs
      .select(col(idCol), Vectors.quantize(col(vecCol)).as("__q"))
      .withColumn("__n", sqrt(Vectors.dotQN(col("__q"), col("__q")).cast("double")))
    val bench = benchmark
      .select(col(benchIdCol), Vectors.quantize(col(benchVecCol)).as("__bq"))
      .withColumn("__bn", sqrt(Vectors.dotQN(col("__bq"), col("__bq")).cast("double")))
    corpus.crossJoin(broadcast(bench))
      .withColumn("__cos",
        Vectors.dotQN(col("__q"), col("__bq")).cast("double") / (col("__n") * col("__bn")))
      .where(col("__cos") >= threshold)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bench_hits"), max(col("__cos")).as("max_cosine"))
  }

  /** Corpus vectors surviving semantic decontamination. */
  def semanticClean(
      vecs: DataFrame, benchmark: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      benchIdCol: String = "bench_id", benchVecCol: String = "embedding"): DataFrame =
    vecs.join(
      semanticContaminated(vecs, benchmark, threshold, idCol, vecCol,
        benchIdCol, benchVecCol).select(idCol),
      Seq(idCol), "left_anti")

  /** TF-IDF top-k terms per document: tf = in-doc term count, idf =
    * ln(N / df) over the corpus, top-k by score with term tie-break,
    * rendered as an ordered comma-joined string.
    *
    * Scale shape: two shuffles — (doc, term) counts, then term df — and
    * the df side joins back keyed on the term. The per-doc top-k is an
    * in-row sort of that doc's terms (bounded by document length), not a
    * global window.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 5,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    tfIdfTopTermsWith(docs, k, textCol, idCol) { (tf, idf) =>
      tf.cast("double") * idf
    }

  /** Cross-engine verification twin of [[tfIdfTopTerms]]: idf quantized to
    * integer micro-units (floor(ln(N/df)*1e6 + 0.5)) so the ranking is
    * pure integer arithmetic any engine reproduces bit-for-bit — same
    * portable-variant discipline as the md5 MinHash/SimHash twins. The
    * double-score variant stays the production path.
    */
  def tfIdfTopTermsQuantized(docs: DataFrame, k: Int = 5,
                             textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    tfIdfTopTermsWith(docs, k, textCol, idCol) { (tf, idf) =>
      (tf * floor(idf * 1000000.0 + 0.5).cast("long")).cast("double")
    }

  private def tfIdfTopTermsWith(
      docs: DataFrame, k: Int, textCol: String, idCol: String)(
      score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    // corpus size as a broadcast 1-row frame, not a driver-side count():
    // keeps the operator fully lazy (one job, no extra eager pass)
    val wide = graft.core.Parallelism.widenForCpu(docs)
    val nDocs = wide.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("__n_docs"))
    val terms = wide
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = terms.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        score(col("tf"), log(col("__n_docs") / col("df").cast("double"))))
      .groupBy(idCol)
      .agg(slice(sort_array(collect_list(struct(
          (-col("score")).as("neg"), col("term"))), asc = true), 1, k)
        .as("top"))
      .select(col(idCol),
        array_join(transform(col("top"), x => x.getField("term")), ",").as("top_terms"))
  }
}
