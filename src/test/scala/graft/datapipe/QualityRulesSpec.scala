package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-filter ruleset: each rule fires on exactly the documents its
  * predicate describes, annotate/split/summary agree with each other, and
  * annotation stays a pure map (no shuffle in the plan).
  */
class QualityRulesSpec extends SparkSpec {

  // one document per failure mode + two clean ones
  private def fixture = {
    val s = spark; import s.implicits._
    val clean = "the quick brown fox jumps over a lazy dog and runs " +
      "of to the big field where many other animals play games all day long"
    Seq(
      (1L, clean),                                     // keeps
      (2L, clean + " while birds sing songs above them"), // keeps
      (3L, "short text only here"),                    // too_few_tokens (+low stopword)
      (4L, ("spark " * 30).trim),                      // high_dup_token_ratio (+low stopword)
      (5L, clean.replace(" ", " !! ")),                // high_symbol_ratio, low_alpha_token_ratio
      (6L, Seq.fill(8)("the same line of text and a word").mkString("\n") +
        "\nthe unique closing line of this and a text"), // high_dup_line/dup_token
      (7L, ("internationalization " * 25).trim)        // mean_token_len + dup + stopword
    ).toDF("doc_id", "text")
  }

  test("each rule fires on its designed document and annotate/split/summary agree") {
    val annotated = QualityRules.annotate(fixture)
    val byDoc = annotated.select("doc_id", "failed_rules").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap

    assert(byDoc(1L).isEmpty && byDoc(2L).isEmpty)
    assert(byDoc(3L).contains("too_few_tokens"))
    assert(byDoc(4L).contains("high_dup_token_ratio"))
    assert(byDoc(5L).contains("high_symbol_ratio"))
    assert(byDoc(5L).contains("low_alpha_token_ratio"))
    assert(byDoc(6L).contains("high_dup_line_ratio"))
    assert(byDoc(7L).contains("mean_token_len_out_of_range"))
    assert(byDoc(7L).contains("low_stopword_ratio"))

    val (kept, dropped) = QualityRules.split(fixture)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(dropped.count() == 5L)

    val row = QualityRules.summary(fixture).collect().head
    assert(row.getAs[Long]("n_kept") == 2L)
    assert(row.getAs[Long]("n_total") == 7L)
    assert(row.getAs[Long]("too_few_tokens") == 1L)
    assert(row.getAs[Long]("too_many_tokens") == 0L)
    // summary per-rule counts match the annotated reasons exactly
    QualityRules.rules().foreach { case (name, _) =>
      val fromAnnotate = byDoc.values.count(_.contains(name)).toLong
      assert(row.getAs[Long](name) == fromAnnotate, s"rule $name count")
    }
  }

  test("annotation is a pure map: no Exchange in the plan") {
    val plan = QualityRules.annotate(fixture)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"annotate must not shuffle:\n$plan")
  }

  test("split with frontier=true materializes once and matches the lazy split") {
    val (k1, d1) = QualityRules.split(fixture)
    val (k2, d2) = QualityRules.split(fixture, frontier = true)
    assert(k2.select("doc_id").collect().map(_.getLong(0)).toSet ==
      k1.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(d2.count() == d1.count())
    // the frontiered sides read a materialized scan, not the original plan
    val plan = k2.queryExecution.executedPlan.toString
    assert(!plan.contains("regexp_extract_all"),
      s"frontiered side must not re-tokenize:\n$plan")
  }

  test("thresholds are configurable") {
    val strict = QualityRules.Config(minTokens = 1000L)
    val (kept, _) = QualityRules.split(fixture, strict)
    assert(kept.count() == 0L)
  }

  test("empty stopword list is accepted: stopword_ratio is 0 everywhere") {
    // regression: array(Nil.map(lit)) builds array<null>, which TextStats's
    // foldable-array<string> input check rejects at analysis time
    val rows = QualityRules.withMetrics(fixture, stopwords = Nil)
      .select("doc_id", "stopword_ratio").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) == 0.0,
      s"doc ${r.getLong(0)} stopword_ratio with no stopwords"))
    // and the ruleset path composes: every doc now fails low_stopword_ratio
    val annotated = QualityRules.annotate(
      fixture, QualityRules.Config(stopwords = Nil))
    assert(annotated.where(array_contains(col("failed_rules"),
      "low_stopword_ratio")).count() == 7L)
  }
}
