package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus phrase mining by discounted pointwise mutual information —
  * the word2vec phrase-detection pass (Mikolov et al. 2013, "Distributed
  * Representations of Words and Phrases and their Compositionality" §4):
  * score(a,b) = (n_ab − delta) · N / (n_a · n_b), keep adjacent pairs
  * above a threshold. The discount `delta` suppresses phrases built from
  * very infrequent words.
  *
  * Scale shape: two explode+partial-aggregate passes over the text (one
  * unigram, one bigram count table) and then joins on COUNT TABLES only —
  * corpus text never reaches a join, the same discipline as
  * [[LanguageModel]]. The bigram table is pre-pruned by `minCount` before
  * the unigram joins, and the corpus token total N rides a broadcast
  * 1-row frame.
  *
  * All scoring is 64-bit integer arithmetic
  * (score_micro = (n_ab − delta)·N·1e6 div (n_a·n_b)), exact in any
  * engine; overflows only when (n_ab − delta)·N exceeds ~9.2e12 — at
  * web scale switch the numerator to log space (quantLog) before then.
  */
object Phrases {

  /** Mine phrases: output (w1, w2, n_pair, n_w1, n_w2, score_micro),
    * pairs with n_pair > delta, n_pair >= minCount and
    * score_micro >= minScoreMicro. The n_pair > delta guard keeps the
    * numerator positive so integer-division semantics (truncate vs
    * floor) never diverge across engines.
    */
  def pmiPhrases(docs: DataFrame, minCount: Int = 2, delta: Int = 1,
                 minScoreMicro: Long = 0L, textCol: String = "text"): DataFrame = {
    require(minCount >= 1 && delta >= 0, "minCount >= 1, delta >= 0")
    val t = TextAnalysis.tokens(col(textCol))
    val wide = graft.core.Parallelism.widenForCpu(docs)
    val uni = wide.select(explode(t).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val tot = uni.agg(sum(col("n_w")).as("__N"))
    val pairs = wide
      .where(size(t) >= 2)
      .withColumn("__t", t)
      .select(explode(TextAnalysis.adjacentPairs(col("__t"))).as("p"))
      .select(col("p.a").as("w1"), col("p.b").as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount && col("n_pair") > delta)
    pairs
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("score_micro",
        expr(s"((n_pair - $delta) * __N * 1000000) div (n_w1 * n_w2)"))
      .where(col("score_micro") >= minScoreMicro)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        col("score_micro"))
  }
}
