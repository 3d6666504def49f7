package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  private def docsDf = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark query planning internals"),
      (3L, "warm up the quick brown fox jumps over the lazy dog again"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
  }

  private def benchDf = {
    val s = spark; import s.implicits._
    Seq((100L, "quick brown fox jumps over the lazy dog")).toDF("bench_id", "text")
  }

  test("contaminated flags docs sharing benchmark n-grams; clean drops them") {
    val hits = Decontaminate.contaminated(docsDf, benchDf, n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matched_ngrams"), r.getAs[Long]("n_benchmarks"))).toMap
    // docs 1 and 3 embed the full benchmark 8-gram window; 2 and 4 do not
    assert(hits.keySet == Set(1L, 3L))
    assert(hits(1L)._2 == 1L && hits(3L)._2 == 1L)
    assert(hits(1L)._1 >= 1L)
    val surviving = Decontaminate.clean(docsDf, benchDf, n = 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(surviving == Set(2L, 4L))
    // minMatches above the overlap suppresses the flag
    assert(Decontaminate.contaminated(docsDf, benchDf, n = 8, minMatches = 100)
      .count() == 0L)
  }

  test("contaminated plans NO Expand (pre-distinct counts, not multi-countDistinct)") {
    val plan = Decontaminate.contaminated(docsDf, benchDf, n = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand in plan:\n$plan")
    // and the benchmark side still broadcasts (corpus never shuffles for the join)
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("quantized tf-idf twin ranks identically to the double-score path") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha alpha alpha beta gamma"),
      (2L, "beta beta gamma gamma delta"),
      (3L, "delta epsilon epsilon alpha zeta"),
      (4L, "zeta zeta zeta gamma alpha")
    ).toDF("doc_id", "text")
    def render(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("top_terms")).toMap
    val exact = render(Decontaminate.tfIdfTopTerms(corpus, k = 2))
    val quant = render(Decontaminate.tfIdfTopTermsQuantized(corpus, k = 2))
    assert(exact == quant)
    // doc 1: alpha tf=3 (df=3), beta tf=1 (df=2) -> alpha first
    assert(exact(1L).startsWith("alpha"))
    assert(exact.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("semanticContaminated flags cosine hits vs the bench set; corpus never shuffles") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // = bench 100
      (2L, Array(0.9f, 0.1f, 0.0f)),   // near bench 100
      (3L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to both
      (4L, Array(0.0f, 0.6f, 0.8f))    // near bench 101
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 0.5f, 0.9f))
    ).toDF("bench_id", "embedding")
    val out = Decontaminate.semanticContaminated(corpus, bench, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_bench_hits"), r.getAs[Double]("max_cosine"))).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L)._1 == 1L && out(1L)._2 == 1.0)
    assert(out(2L)._2 > 0.9 && out(2L)._2 < 1.0)
    // clean keeps only the orthogonal vector
    assert(Decontaminate.semanticClean(corpus, bench, threshold = 0.9)
      .collect().map(_.getAs[Long]("vec_id")).toSet == Set(3L))
    // bench side broadcasts: the plan has a BroadcastNestedLoopJoin and
    // no shuffle on the corpus side of the join
    val plan = Decontaminate.semanticContaminated(corpus, bench, threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
