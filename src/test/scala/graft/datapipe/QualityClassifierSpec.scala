package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Naive-Bayes quality classifier: discriminative tokens get the right
  * log-odds sign, scoring separates good-like from bad-like documents,
  * and pruning keeps the most discriminative terms.
  */
class QualityClassifierSpec extends SparkSpec {

  private def labeled = {
    val s = spark; import s.implicits._
    val good = (0 until 20).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again", true))
    val bad = (20 until 40).map(i =>
      (i.toLong, "buy cheap pills casino winner click here now free", false))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("train assigns positive log-odds to good-corpus tokens, negative to bad") {
    val vocab = QualityClassifier.train(labeled)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(vocab("fox") > 0L && vocab("quick") > 0L)
    assert(vocab("casino") < 0L && vocab("pills") < 0L)
  }

  test("score separates good-like from bad-like unseen documents") {
    val s = spark; import s.implicits._
    val vocab = QualityClassifier.train(labeled)
    val unseen = Seq(
      (100L, "the brown dog jumps again"),
      (101L, "cheap casino pills free winner"),
      (102L, "entirely novel vocabulary sentence")) // all OOV -> mean 0
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(unseen, vocab)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(100L)._2 == 1L, "good-vocabulary doc predicted good")
    assert(out(101L)._2 == 0L, "bad-vocabulary doc predicted bad")
    assert(out(102L) == ((0L, 0L)), "OOV doc scores exactly 0, predicted bad")
  }

  test("pruneVocab keeps the topN by |log-odds| and scoring still works") {
    val vocab = QualityClassifier.train(labeled)
    val pruned = QualityClassifier.pruneVocab(vocab, 5)
    assert(pruned.count() == 5L)
    val minKept = pruned.agg(min(abs(col("log_odds_micro")))).first().getLong(0)
    val maxDropped = vocab.join(pruned.select("token"), Seq("token"), "left_anti")
      .agg(max(abs(col("log_odds_micro")))).first().getLong(0)
    assert(minKept >= maxDropped, "pruning must keep the most discriminative terms")
  }

  test("trainAndScore end-to-end: rules-labeled corpus, every doc scored") {
    val s = spark; import s.implicits._
    // good docs pass the default ruleset (prose-like, 20+ tokens); bad
    // docs trip it (few tokens / heavy symbols)
    val corpus = ((0 until 10).map(i => (i.toLong,
        "the cat and the dog walked to the park and back home of a sunny day " +
          "with the wind of autumn to keep them company and all was well")) ++
      (10 until 20).map(i => (i.toLong, "$$$ !!! @@@ ###")))
      .toDF("doc_id", "text")
    val out = QualityClassifier.trainAndScore(corpus)
    assert(out.count() == 20L)
    val pred = out.collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert((0 until 10).forall(i => pred(i.toLong) == 1L))
    assert((10 until 20).forall(i => pred(i.toLong) == 0L))
  }

  test("score is layout-independent (repartition invariant)") {
    val s = spark; import s.implicits._
    val vocab = QualityClassifier.train(labeled)
    val unseen = Seq(
      (1L, "the fox and the casino"), (2L, "dog pills dog pills"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      QualityClassifier.score(df, vocab).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
    assert(rows(unseen) == rows(unseen.repartition(7)))
  }
}
