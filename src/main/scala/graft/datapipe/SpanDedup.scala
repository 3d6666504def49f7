package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level repeated-span removal — the ExactSubstr family (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models Better"):
  * any token span repeated elsewhere in the corpus is removed from every
  * occurrence but one, leaving a single canonical copy. Document-level
  * dedup (exact / MinHash) misses these: boilerplate stretches, quoted
  * passages, and templated sections repeat across documents whose
  * SURROUNDING text differs.
  *
  * The published implementation builds a corpus suffix array — inherently
  * single-machine. The Spark-shaped equivalent used here marks duplicated
  * fixed-length k-grams instead: a span repeated verbatim contains only
  * duplicated k-grams, so removing tokens covered by duplicated k-gram
  * occurrences (minus one kept occurrence per gram) removes every
  * repeated span of length >= k. Spans shorter than k survive — the same
  * threshold role as ExactSubstr's minimum match length (50 tokens in the
  * paper; k is the knob here).
  *
  * Scale shape — fully LINEAR, no pair materialization anywhere (unlike
  * the candidate-pair dedups, nothing here is O(df²)):
  *   1. one shuffle of (gram_hash, id, pos) postings grouped by gram —
  *      count + min are partial aggregates, so hot boilerplate grams
  *      combine map-side;
  *   2. postings re-join the duplicated-gram table on the 8-byte hash;
  *      output is bounded by the posting count;
  *   3. covered positions distinct + anti-join + one per-document
  *      reassembly groupBy, each linear in corpus tokens.
  * Grouping key is xxhash64 of the gram text: the hash never reaches the
  * output (only membership in the duplicated set does), so the oracle's
  * string-grouped twin is exact absent a 64-bit collision (~1e-11 at the
  * fixture's 1e5 grams; at 1e12 grams a collision merges two gram
  * families and over-removes ONE span occurrence — the accepted failure
  * mode of every hashed-fingerprint dedup in this codebase).
  */
object SpanDedup {

  /** Keeper-occurrence composite key: (doc_id, pos) packed into one long
    * so min() stays a single partial aggregate. Precondition: documents
    * under ~1e6 tokens (the curation contract's doc-size cap; a 100 TB
    * corpus with longer docs raises the stride).
    */
  private val PosStride = 1000000L

  private def occKey(idCol: String): Column = col(idCol) * PosStride + col("pos")

  /** K-gram occurrence postings: (gram_h, id, pos) with pos the 0-based
    * token index of the gram start. Gram hashing is the native
    * [[graft.functions.GramHashes]] pass — each token hashed once, k
    * consecutive token hashes combined, zero gram-string allocation; the
    * replaced `transform(sequence(...), i -> xxhash64(array_join(slice)))`
    * was interpreted HOF evaluation building a string per gram (VERDICT
    * r14 item 4; the hash never reaches the output, so the grouping
    * contract is unchanged).
    */
  def kgramOccurrences(docs: DataFrame, k: Int,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val t = col("__toks")
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(t) >= k) // short docs have no grams; prune before explode
      // posexplode_OUTER: a plain posexplode lets Catalyst infer a
      // `size(...) > 0` filter below the projection, re-evaluating the
      // gram-hash expression once more per row in an interpreted Filter
      // (the Winnowing lesson); the >= k guard already makes the array
      // non-empty, so outer semantics are identical here
      .select(col(idCol),
        posexplode_outer(call_function(graft.functions.GraftFunctions.gramHashesName,
          t, lit(k), lit(0L))).as(Seq("pos", "gram_h")))
  }

  /** Occurrences to remove: every posting of a corpus-duplicated gram
    * except the gram's first occurrence in (doc_id, pos) order — the
    * deterministic "keep one canonical copy" rule.
    */
  def markedOccurrences(occ: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val dup = occ.groupBy("gram_h")
      .agg(count(lit(1)).as("__n_occ"), min(occKey(idCol)).as("__keeper"))
      .where(col("__n_occ") >= 2)
    occ.join(dup, Seq("gram_h"))
      .where(occKey(idCol) =!= col("__keeper"))
      .select(col(idCol), col("pos"))
  }

  /** Remove every token covered by a marked duplicated-gram occurrence
    * and reassemble the survivors in order. One row per input document:
    * (id, n_tokens, n_removed, text_dedup) — text_dedup is "" when the
    * whole document was duplicated elsewhere (callers typically drop
    * those rows, the ExactSubstr analogue of an exact-dup document).
    *
    * Reassembly never shuffles tokens as ROWS: covered positions
    * aggregate to a per-document set (bounded by the duplicated-posting
    * count, NOT corpus size), join back to the tokenized row by id —
    * array-level, one exchange worst-case, and a broadcast (no corpus
    * movement at all) whenever the covered-doc set fits AQE's
    * threshold — and an order-preserving positional `filter` drops
    * covered slots in place. The earlier shape — posexplode every
    * corpus token, anti-join, re-sort, collect_list — moved the corpus
    * token-by-token through TWO exchanges plus a sort to rebuild
    * arrays Spark already held (measured r10 at sf1: 11.1 s → 7.2 s;
    * see SCALE.md). Per-doc filter cost is O(n·|cov|) membership
    * tests; both factors are bounded by the document token cap (the
    * PosStride contract), and a pathological fully-covered giant doc
    * was no cheaper in the collect_list shape (one 1e6-struct
    * aggregation buffer).
    */
  def removeDuplicatedSpans(docs: DataFrame, k: Int = 5,
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col("__toks")
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    val coveredPerDoc = markedOccurrences(kgramOccurrences(docs, k, textCol, idCol), idCol)
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .groupBy(idCol)
      .agg(collect_set(col("tpos")).as("__cov"))
    toks.join(coveredPerDoc, Seq(idCol), "left")
      .select(col(idCol), t, col("__cov"),
        when(col("__cov").isNull, t).otherwise(
          filter(t, (_, i) => !array_contains(col("__cov"), i))).as("__kept"))
      .select(col(idCol),
        size(t).cast("long").as("n_tokens"),
        (size(t) - size(col("__kept"))).cast("long").as("n_removed"),
        array_join(col("__kept"), " ").as("text_dedup"))
  }
}
