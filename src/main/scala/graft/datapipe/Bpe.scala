package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a corpus (Sennrich et al.,
  * ACL 2016) — the count-heavy half of training a BPE vocabulary, as
  * Spark aggregations: word frequencies once, then per merge round a
  * (symbol-pair) keyed count and an argmax.
  *
  * Scale shape: the corpus text is touched ONCE ([[wordFreqs]] — one
  * token explode + one (word) shuffle with map-side combine); every
  * merge round after that runs on the WORD-FREQUENCY table, whose size
  * is the corpus vocabulary (millions of rows, not billions) and whose
  * pair-count aggregate is (s1, s2)-keyed with partial aggregation. The
  * per-round argmax is a 1-row driver fetch — the merge table is driver
  * state by construction (it IS the tokenizer being built), the same
  * metadata-scale exception as job state. Real trainers (subword-nmt,
  * HuggingFace tokenizers) hold word counts in one process; this shape
  * distributes the count work and keeps only the argmax on the driver.
  */
object Bpe {

  /** (word, freq) over the corpus — the only pass that reads text. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Single-character symbol array of `word` (initial BPE segmentation;
    * no end-of-word marker — merges never cross word boundaries here
    * because pairs are counted within words only). Empty words map to an
    * empty array — sequence(1, 0) DESCENDS in Spark, so the unguarded
    * form would yield a phantom ["", ""] that counts a ("","") pair.
    */
  def chars(word: Column): Column =
    when(length(word) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(word)), i =>
        word.substr(i, lit(1))))

  /** Adjacent-symbol pair counts weighted by word frequency:
    * (s1, s2, pair_count) — one merge round's statistics.
    */
  def pairCounts(segmented: DataFrame, symsCol: String = "syms",
                 freqCol: String = "freq"): DataFrame =
    segmented
      .where(size(col(symsCol)) >= 2)
      .select(col(freqCol),
        explode(TextAnalysis.adjacentPairs(col(symsCol))).as("p"))
      .groupBy(col("p.a").as("s1"), col("p.b").as("s2"))
      .agg(sum(col(freqCol)).as("pair_count"))

  /** One-pass pair statistics for a corpus: [[wordFreqs]] segmented to
    * chars, pairs counted — round 0 of training, fully relational.
    */
  def corpusPairCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    pairCounts(wordFreqs(docs, textCol).withColumn("syms", chars(col("word"))))

  /** Greedy left-to-right application of one merge (s1, s2) -> s1+s2 to
    * a symbol array: "aaa" under (a,a) becomes [aa, a], matching
    * reference BPE. `aggregate` threads the building array, so each
    * symbol is inspected once (the [[Boilerplate]] seen-set pattern —
    * lambda references are attributes, the HOF re-eval trap does not
    * apply; per-word cost is O(len²) array rebuilds on <~20-char words).
    */
  def applyMerge(syms: Column, s1: String, s2: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(s1) && x === lit(s2),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(s1 + s2))))
        .otherwise(concat(acc, array(x))))

  /** Segment one word under an ordered merge list: start from chars,
    * apply each merge greedily in training order — the standard BPE
    * encode. Builds one nested expression per merge, so it suits the
    * demo/test vocabularies [[train]] produces (tens of merges); a
    * production 30k-merge vocabulary needs a per-word trie/heap encoder
    * (genuine per-partition imperative logic — the mapPartitions
    * extension point, like the Multimodal codec).
    */
  def encodeWith(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(chars(word)) { case (syms, (a, b)) => applyMerge(syms, a, b) }

  /** Documents tokenized under a trained merge list: (id, bpe_tokens)
    * with every whitespace token segmented by [[encodeWith]] and the
    * per-word pieces flattened in order. Pure map — no shuffle; pair
    * with [[Sampling.tokenBudget]] for budget selection under the
    * TRAINED vocabulary instead of the whitespace proxy.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    graft.core.Parallelism.widenForCpu(docs).select(col(idCol),
      flatten(transform(TextAnalysis.tokens(col(textCol)),
        w => encodeWith(w, merges))).as("bpe_tokens"))

  /** Imperative twin of [[encode]] — the production encode path. The
    * expression form nests one interpreted `aggregate` per merge, and
    * the honest-action bench showed that chain at ~150 µs/word (296 s
    * over sf1's 2M words for 9 merges); this one-pass mapPartitions
    * encoder runs the same greedy fold in plain Scala arrays,
    * spec-proven identical to [[encodeWith]]. Still O(merges × len)
    * per word — a 30k-merge vocabulary wants the rank-map + heap
    * encoder (find lowest-rank adjacent pair, merge, repeat), the
    * documented next step on this extension point.
    */
  def encodePartitions(docs: DataFrame, merges: Seq[(String, String)],
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val mergeArr = merges.toArray
    val ws = s"[${TextAnalysis.wsClass}]+"
    graft.core.Parallelism.widenForCpu(docs)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
          for (w <- text.trim.toLowerCase.split(ws, -1) if w.nonEmpty) {
            var syms: Array[String] = w.map(_.toString).toArray
            for ((s1, s2) <- mergeArr) {
              val nb = scala.collection.mutable.ArrayBuffer.empty[String]
              for (x <- syms) {
                if (nb.nonEmpty && nb.last == s1 && x == s2)
                  nb(nb.length - 1) = s1 + s2
                else nb += x
              }
              syms = nb.toArray
            }
            pieces ++= syms
          }
          (id, pieces.toSeq)
        }
      }
      .toDF(idCol, "bpe_tokens")
  }

  /** Train `nMerges` BPE merges: per round, count pairs over the
    * frontier'd word table, fetch the argmax — count desc, ties broken
    * by the lexicographically GREATEST (s1, s2), matching subword-nmt's
    * `max(stats, key=lambda x: (stats[x], x))` so a tied round learns
    * the same merge a subword-nmt-trained tokenizer would — apply it,
    * repeat. Returns the ordered merge list; stops early when no pair
    * remains.
    */
  def train(docs: DataFrame, nMerges: Int,
            textCol: String = "text"): Seq[(String, String)] = {
    var segH = graft.core.Materialize.frontierHandle(
      wordFreqs(docs, textCol).withColumn("syms", chars(col("word"))))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (!exhausted && merges.length < nMerges) {
      val top = pairCounts(segH.df)
        .orderBy(desc("pair_count"), desc("s1"), desc("s2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (s1, s2) = (top(0).getAs[String]("s1"), top(0).getAs[String]("s2"))
        merges += ((s1, s2))
        val next = graft.core.Materialize.frontierHandle(
          segH.df.withColumn("syms", applyMerge(col("syms"), s1, s2)))
        // round i's segmentation fed round i+1, now materialized — free it
        segH.release()
        segH = next
      }
    }
    segH.release() // merges are driver-side; nothing references the table
    merges.toSeq
  }
}
