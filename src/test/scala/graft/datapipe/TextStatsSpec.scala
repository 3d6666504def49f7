package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native single-pass TextStats metrics must be column-for-column
  * identical (exact double equality — both sides divide the same exact
  * integer counts) to the declarative higher-order twin, on curated
  * edge fixtures and random corpora.
  */
class TextStatsSpec extends SparkSpec {

  private val cols = Seq("n_tokens", "mean_token_len", "stopword_ratio",
    "symbol_ratio", "alpha_token_ratio", "dup_token_ratio", "dup_line_ratio")

  private def bothWays(inputs: Seq[String]): Unit = {
    val s = spark; import s.implicits._
    val docs = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = QualityRules.withMetrics(docs)
      .orderBy("doc_id").select("doc_id", cols: _*).collect()
    val decl = QualityRules.withMetricsDeclarative(docs)
      .orderBy("doc_id").select("doc_id", cols: _*).collect()
    native.zip(decl).foreach { case (n, d) =>
      assert(n === d,
        s"metric mismatch for doc ${n.getLong(0)} ('${inputs(n.getLong(0).toInt).take(40)}')")
    }
  }

  test("native metrics equal the declarative twin on edge fixtures") {
    bothWays(Seq(
      "the cat sat on the mat",
      "",                       // empty -> one empty token, n_tokens = 1
      "   ",                    // whitespace-only -> trims to empty
      "ONE two THREE two one",  // case folding + dup tokens
      "a\nb\nb\na\n",           // dup lines incl trailing empty line
      "line only",
      "!!! ### *** @@@",        // all symbols
      "täb über straße", // non-ASCII letters (symbols, not a-z)
      "emoji 😀 here",        // supplementary codepoint
      "the the the the the",    // pure stopwords
      "tab\tand\rreturns\fform",
      "x " * 500))              // long repetitive doc
  }

  test("native metrics equal the declarative twin on random corpora") {
    val piece = Gen.oneOf("the", "cat", "!", "\n", " ", "\t", "Ab9",
      "naïve", "*", "##", "of", "to", "zz")
    val genDoc = for {
      n <- Gen.choose(0, 30)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString(" ")
    val docs = (0 until 60).flatMap { seed =>
      genDoc(Gen.Parameters.default, Seed(seed.toLong)).toList
    }
    bothWays(docs)
  }
}
