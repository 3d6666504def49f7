package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level deduplication for training-data curation — the published
  * boilerplate-removal stage (here: drop lines appearing in >= 3 DISTINCT
  * documents, a document-frequency variant of C4's occurrence rule — a
  * line repeated 3x inside a single document is deliberately kept;
  * Lee et al. 2022 show corpus-level repeated-substring
  * removal improves LM quality): navigation chrome, cookie banners,
  * license footers repeat across millions of pages and survive
  * document-level dedup because the documents AROUND them differ.
  *
  * Two granularities:
  *   - corpus-level ([[frequentLines]] + [[removeLines]]): lines whose
  *     document frequency crosses a threshold are removed from every
  *     document;
  *   - within-document ([[dedupLinesInDoc]]): later repeats of a line
  *     inside one document are dropped — a pure map, no shuffle.
  *
  * Scale shape (100 TB lens): the frequent-line set is the HEAD of the
  * line-frequency distribution — tiny relative to the corpus — so
  * [[removeLines]] is a broadcast-able join against exploded lines plus
  * one groupBy(doc) reassembly shuffle carrying only kept lines. Nothing
  * ever compares documents pairwise. In production, key the blocklist
  * join on [[TextAnalysis.fingerprint64]] of the line (8-byte keys)
  * rather than the line text; the text form here keeps the operator
  * reproducible by any SQL engine for the oracle.
  */
object Boilerplate {

  private def normLines(textCol: String): Column =
    transform(split(col(textCol), "\n"), l => lower(trim(l)))

  /** Corpus blocklist: normalized lines appearing in at least
    * `minDocFreq` DISTINCT documents, with their document frequencies.
    * array_distinct inside the row makes one (doc, line) pair per
    * document, so the aggregate is a plain count — one shuffle of
    * (line) keys with map-side combine, never a count-distinct.
    */
  def frequentLines(docs: DataFrame, minDocFreq: Long = 3L,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), explode(array_distinct(normLines(textCol))).as("line"))
      .where(col("line") =!= "")
      .groupBy("line")
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocFreq)

  /** Remove every blocklisted line from every document. Returns one row
    * per input document: (id, n_lines, n_removed, text) where `text` is
    * the surviving lines re-joined in original order (empty string when
    * every line was blocklisted — callers typically drop those rows).
    *
    * Plan: posexplode lines -> left join the blocklist (AQE broadcasts
    * it when small, which the head-of-distribution blocklist is) -> one
    * groupBy(id) reassembly. The per-document collect_list is bounded by
    * the document's own line count.
    */
  def removeLines(docs: DataFrame, blocklist: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "raw")))
      .withColumn("line", lower(trim(col("raw"))))
    lines
      .join(blocklist.select(col("line"), lit(true).as("__blocked")), Seq("line"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__blocked"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(
                col("pos"), col("raw"),
                coalesce(col("__blocked"), lit(false)).as("b")))),
              x => !x.getField("b")),
            x => x.getField("raw")),
          "\n").as(textCol))
  }

  /** One-call corpus boilerplate removal: build the blocklist at
    * `minDocFreq` and strip it from every document.
    */
  def stripBoilerplate(docs: DataFrame, minDocFreq: Long = 3L,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    removeLines(docs, frequentLines(docs, minDocFreq, textCol, idCol), textCol, idCol)

  /** Within-document line dedup: keep the FIRST occurrence of each
    * normalized line, drop later repeats. Pure column expression (a map
    * over the documents table — zero shuffle).
    *
    * Shape matters: a lambda that references a `transform(lines, ...)`
    * norm array re-evaluates it once PER FILTERED ELEMENT (higher-order
    * functions are interpreted — the langId lesson), turning O(lines)
    * normalization into O(lines²). `aggregate` evaluates its input array
    * exactly once and threads the seen-set through the accumulator, so
    * per-element work is only the equality scan (cheap, bounded by the
    * document's own line count).
    */
  def dedupLinesInDoc(text: Column): Column = {
    val lines = split(text, "\n")
    val indexed = zip_with(lines, transform(lines, l => lower(trim(l))),
      (raw, n) => struct(raw.as("raw"), n.as("norm")))
    val kept = aggregate(indexed,
      array().cast("array<struct<raw:string,norm:string>>"),
      (acc, x) =>
        when(exists(acc, a => a.getField("norm") === x.getField("norm")), acc)
          .otherwise(concat(acc, array(x))))
    array_join(transform(kept, x => x.getField("raw")), "\n")
  }
}
