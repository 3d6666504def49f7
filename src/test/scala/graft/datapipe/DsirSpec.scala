package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private def corpus = {
    val s = spark; import s.implicits._
    ((0 until 6).map(i => (i.toLong, "legal",
      "the party of the first part shall indemnify the party of the second part")) ++
      (6 until 12).map(i => (i.toLong, "web",
        "click here to subscribe and win a free prize today only")))
      .toDF("doc_id", "source", "text")
  }

  test("select: target-like candidates outrank raw-typical ones") {
    val s = spark; import s.implicits._
    val cands = Seq(
      (100L, "the party shall indemnify the second part of the contract"),
      (101L, "indemnify the party of the first part in full"),
      (200L, "click here to win a free prize today"),
      (201L, "subscribe today and win a prize")
    ).toDF("doc_id", "text")
    val top2 = Dsir.select(cands,
        corpus.where(col("source") === "legal"), corpus, n = 2, nBuckets = 512)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(100L, 101L),
      s"legal-like candidates must win the importance ranking: $top2")
  }

  test("importanceWeights: deterministic, layout-independent, bucket-bounded counts") {
    val tc = Dsir.featureCounts(corpus.where(col("source") === "legal"), nBuckets = 64)
    val rc = Dsir.featureCounts(corpus, nBuckets = 64)
    assert(tc.count() <= 64 && rc.count() <= 64,
      "count tables must be bounded by nBuckets regardless of corpus size")
    val w1 = Dsir.importanceWeights(corpus, tc, rc, nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w2 = Dsir.importanceWeights(corpus.repartition(7), tc, rc, nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w1 == w2, "hashed-feature weights must not depend on layout")
    // in-target docs weigh more target-like than out-of-target docs
    assert((0 until 6).forall(i => w1(i.toLong) > w1(6L)),
      s"legal training docs must outweigh web docs under the legal target: $w1")
  }

  test("selectGumbel: deterministic proportional sample, seed changes the draw") {
    val s = spark; import s.implicits._
    val sel = Dsir.selectGumbel(corpus,
      corpus.where(col("source") === "legal"), corpus, n = 4, nBuckets = 64)
    val ids = sel.collect().map(_.getLong(0)).toSeq
    // engine-exact: same seed + layout change -> identical sampled set
    val ids2 = Dsir.selectGumbel(corpus.repartition(7),
      corpus.where(col("source") === "legal"), corpus, n = 4, nBuckets = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(ids2 == ids, "hashed-id Gumbel noise must be layout-independent")
    // strongly peaked weights dominate: legal docs (weight gap >> Gumbel
    // spread is not guaranteed at n=4, but a MAJORITY should be legal)
    assert(ids.count(_ < 6L) >= 2, s"peaked weights should dominate the draw: $ids")
    // a different gumbelSeed redraws the noise; the key column must move
    val k1 = sel.collect().map(r => r.getAs[Long]("gkey_micro")).toSeq
    val k2 = Dsir.selectGumbel(corpus,
      corpus.where(col("source") === "legal"), corpus, n = 4, nBuckets = 64,
      gumbelSeed = 99L)
      .collect().map(r => r.getAs[Long]("gkey_micro")).toSeq
    assert(k1 != k2, "gumbelSeed must change the noise draw")
  }

  test("select plan: models are fit, not re-derived — only the candidate explode legs remain") {
    val s = spark; import s.implicits._
    val cands = Seq((100L, "the party shall indemnify the second part"))
      .toDF("doc_id", "text")
    val plan = Dsir.select(cands,
        corpus.where(col("source") === "legal"), corpus, n = 2, nBuckets = 64)
      .queryExecution.executedPlan.toString
    // fitModel materializes both count tables, so the execution plan must
    // carry exactly the candidate corpus's SINGLE feature leg (one
    // explode of the native FeatureBucketsMd5 array — the r8 regression
    // shape was SIX string legs, re-training both models inside every
    // execution; the pre-native shape was two)
    val generates = plan.linesIterator.count(_.contains("Generate "))
    assert(generates == 1,
      s"expected 1 explode leg (candidates only), found $generates:\n$plan")
  }

  test("native feature buckets equal the declarative two-leg formulation (bag semantics)") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox the quick"),   // repeated features
      (2L, "single"),                          // unigram only, no bigram
      (3L, ""),                                // empty text
      (4L, "  padded   spacing  here ")        // trim/split edges
    ).toDF("doc_id", "text")
    def bag(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("doc_id", "bucket").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val native = bag(Dsir.hashedFeatures(docs, nBuckets = 64, seed = 3L))
    val declarative = bag(Dsir.hashedFeaturesDeclarative(docs, nBuckets = 64, seed = 3L))
    assert(native === declarative,
      "native FeatureBucketsMd5 must reproduce the declarative bag exactly")
    assert(native.keys.exists(_._1 == 1L) && !native.keys.exists(_._1 == 3L),
      "featureless docs produce no rows")
  }
}
