package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram LM scoring: counts are exact, in-domain text outscores
  * out-of-domain text, smoothing floors unseen n-grams, and scores are
  * layout-independent integers.
  */
class LanguageModelSpec extends SparkSpec {

  private def trusted = {
    val s = spark; import s.implicits._
    (0 until 10).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
  }

  test("unigram/bigram counts are exact") {
    val uni = LanguageModel.unigramCounts(trusted)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni("the") == 40L && uni("sat") == 20L && uni("rug") == 10L)
    val bg = LanguageModel.bigramCounts(trusted)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg(("sat", "on")) == 20L && bg(("the", "cat")) == 10L)
    assert(!bg.contains(("rug", "the")), "bigrams must not cross document bounds")
  }

  test("in-domain text outscores out-of-domain; unseen n-grams hit the floor") {
    val s = spark; import s.implicits._
    val uni = LanguageModel.unigramCounts(trusted)
    val bg = LanguageModel.bigramCounts(trusted)
    val unseen = Seq(
      (100L, "the cat sat on the rug"),
      (101L, "zebra quantum flux perihelion"),
      (102L, "tiny")) // one token -> no row
      .toDF("doc_id", "text")
    val out = LanguageModel.score(unseen, uni, bg)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.size == 2, "single-token doc must produce no score row")
    assert(out(100L) > out(101L),
      s"in-domain must outscore OOV: ${out(100L)} vs ${out(101L)}")
    // all-OOV doc: every bigram scores ln(1/V) exactly
    val v = uni.count()
    val floorMicro = math.floor(math.log(1.0 / v) * 1e6 + 0.5).toLong
    assert(out(101L) == floorMicro)
  }

  test("scores are layout-independent and deterministic") {
    val s = spark; import s.implicits._
    val uni = LanguageModel.unigramCounts(trusted)
    val bg = LanguageModel.bigramCounts(trusted)
    val docsDf = Seq((1L, "the cat sat"), (2L, "dog sat on the mat"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.score(df, uni, bg).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
    assert(rows(docsDf) == rows(docsDf.repartition(7)))
  }

  test("pruneModel keeps the most frequent rows of either table") {
    val pruned = LanguageModel.pruneModel(LanguageModel.bigramCounts(trusted), 3)
    val kept = pruned.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the three most frequent bigrams (20 each beats the 10s)
    assert(pruned.count() == 3)
    assert(kept.contains(("sat", "on")) && kept.contains(("on", "the")))
  }

  test("inconsistently pruned tables never yield a positive logp") {
    val s = spark; import s.implicits._
    // prune unigrams hard (keep 1) but bigrams not at all: surviving
    // bigrams whose w1 unigram was dropped see n_w=0 with n_bg+1 > V —
    // without the clamp the smoothed "probability" exceeds 1
    val uni = LanguageModel.pruneModel(LanguageModel.unigramCounts(trusted), 1)
    val bg = LanguageModel.bigramCounts(trusted)
    val out = LanguageModel.score(
      Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text"), uni, bg)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("sum_logp_micro") <= 0L,
      s"clamped logp must stay <= 0, got ${out.head.getAs[Long]("sum_logp_micro")}")
  }

  test("crossEntropySelect ranks target-like docs first; top-n set is exact") {
    val s = spark; import s.implicits._
    // target domain: legal-ish boilerplate; general corpus mixes it with
    // cooking prose. Candidates: 2 legal-like, 2 cooking-like, 1 OOV.
    val legal = (0 until 6).map(i => (i.toLong, "legal",
      "the party of the first part shall indemnify the party of the second part"))
    val cooking = (6 until 12).map(i => (i.toLong, "food",
      "stir the onions in the pan until golden then add the garlic and salt"))
    val corpus = (legal ++ cooking).toDF("doc_id", "source", "text")
    val cands = Seq(
      (100L, "x", "the party shall indemnify the second part"),
      (101L, "x", "the first part shall indemnify the party"),
      (102L, "x", "stir the garlic in the pan until golden"),
      (103L, "x", "add the onions and salt then stir"),
      (104L, "x", "zebra quantum flux perihelion today"))
      .toDF("doc_id", "source", "text")
    val top2 = LanguageModel.crossEntropySelect(
      cands, corpus.where(col("source") === "legal"), corpus, n = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(100L, 101L),
      s"legal-like candidates must win the contrast ranking: $top2")
    // deterministic under re-partitioning (integer micro-nat ranking)
    val top2b = LanguageModel.crossEntropySelect(
      cands.repartition(5), corpus.where(col("source") === "legal"), corpus, n = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2b == top2)
  }

  test("trainAndScore: rules-kept prose scores above degenerate docs") {
    val s = spark; import s.implicits._
    val corpus = ((0 until 8).map(i => (i.toLong,
        "the cat and the dog walked to the park and back home of a sunny day " +
          "with the wind of autumn to keep them company and all was well")) ++
      (8 until 12).map(i => (i.toLong, "spam spam spam spam spam spam")))
      .toDF("doc_id", "text")
    val out = LanguageModel.trainAndScore(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((0 until 8).forall(i => out(i.toLong) > out(8L)),
      "trusted-slice prose must outscore the degenerate docs")
  }

  test("scoring a parquet-persisted model equals direct trainAndScore") {
    val s = spark; import s.implicits._
    val corpus = ((0 until 8).map(i => (i.toLong,
        "the cat and the dog walked to the park and back home of a sunny day " +
          "with the wind of autumn to keep them company and all was well")) ++
      (8 until 12).map(i => (i.toLong, "spam spam spam spam spam spam")))
      .toDF("doc_id", "text")
    val direct = LanguageModel.trainAndScore(corpus)
      .orderBy("doc_id").collect().toSeq
    // fit-once / persist / reload / score — the lm_model_artifact shape;
    // the parquet roundtrip of the count tables must be value-lossless
    val (uni, bi) = LanguageModel.fitCounts(corpus)
    val root = java.nio.file.Files.createTempDirectory("graft_lm_model").toString
    uni.write.mode("overwrite").parquet(s"$root/uni")
    bi.write.mode("overwrite").parquet(s"$root/bi")
    val viaStore = LanguageModel.score(corpus,
        spark.read.parquet(s"$root/uni"), spark.read.parquet(s"$root/bi"))
      .orderBy("doc_id").collect().toSeq
    assert(viaStore === direct)
  }

  test("perplexityBuckets: per-group exact-rank thirds, score-ordered, deterministic") {
    val s = spark; import s.implicits._
    // 6 docs in lang a (thirds of 2/2/2), 4 in lang b (1/1/2 by the
    // rank*3<=n rule); scores descend with id so the split is readable
    val scored = ((1 to 6).map(i => (i.toLong, "a", 100L - i)) ++
      (11 to 14).map(i => (i.toLong, "b", 100L - i)))
      .toDF("doc_id", "lang", "mean_logp_micro")
    val out = LanguageModel.perplexityBuckets(scored, byCol = "lang")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(
      1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "middle",
      5L -> "tail", 6L -> "tail",
      11L -> "head", 12L -> "middle", 13L -> "tail", 14L -> "tail"))
    val out2 = LanguageModel.perplexityBuckets(scored.repartition(7), byCol = "lang")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out2 == out, "bucketing must be layout-independent")
  }

  test("perplexityBucketsApprox: singleton bins equal exact; coarse bins stay monotone") {
    val s = spark; import s.implicits._
    val scored = ((1 to 6).map(i => (i.toLong, "a", 100L - i)) ++
      (11 to 14).map(i => (i.toLong, "b", 100L - i)))
      .toDF("doc_id", "lang", "mean_logp_micro")
    // distinct scores, range < nBins -> singleton bins -> inclusive
    // cumulative rank == exact rank, so approx must EQUAL exact
    val exact = LanguageModel.perplexityBuckets(scored, byCol = "lang")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val approx = LanguageModel.perplexityBucketsApprox(scored, byCol = "lang")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(approx == exact, "singleton-bin approx must match the exact labeling")

    // coarse bins (nBins = 2 over range 0..99): boundaries snap to bin
    // edges but labels must stay monotone in score and layout-independent
    val wide = (1 to 30).map(i => (i.toLong, "a", (i * 17 % 100).toLong))
      .toDF("doc_id", "lang", "mean_logp_micro")
    val coarse = LanguageModel.perplexityBucketsApprox(wide, byCol = "lang", nBins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    def rankOf(b: String): Int = b match {
      case "head" => 0; case "middle" => 1; case _ => 2 }
    for {
      (_, s1, b1) <- coarse; (_, s2, b2) <- coarse
      if s1 > s2
    } assert(rankOf(b1) <= rankOf(b2),
      s"higher score $s1=$b1 must never rank below lower score $s2=$b2")
    val coarse2 = LanguageModel.perplexityBucketsApprox(
      wide.repartition(5), byCol = "lang", nBins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(coarse2.sortBy(_._1).toSeq == coarse.sortBy(_._1).toSeq,
      "approx bucketing must be layout-independent")
    // ties all land in one bin -> one label (approx never splits a bin)
    val ties = (1 to 9).map(i => (i.toLong, "a", 5L))
      .toDF("doc_id", "lang", "mean_logp_micro")
    val tieLabels = LanguageModel.perplexityBucketsApprox(ties, byCol = "lang")
      .collect().map(_.getString(3)).distinct
    assert(tieLabels.length == 1, "equal scores must share one bucket label")
  }

  test("perplexityBucketsApprox plan: sort/window only on the bin table, labels broadcast") {
    val s = spark; import s.implicits._
    val scored = (1 to 100).map(i => (i.toLong, s"l${i % 3}", (i * 31 % 97).toLong))
      .toDF("doc_id", "lang", "mean_logp_micro")
    val plan = LanguageModel.perplexityBucketsApprox(scored, byCol = "lang", nBins = 8)
      .queryExecution.executedPlan.toString
    // the whole point of the approx twin: the corpus-scale side must never
    // be sorted. Every Sort/Window in the plan has to sit UNDER a
    // BroadcastExchange (the <=nBins-row label branch); a corpus sort
    // would appear above/outside it.
    val lines = plan.linesIterator.toVector
    def indent(l: String): Int = l.indexWhere(c => c.isLetter)
    val bIdx = lines.indexWhere(_.contains("BroadcastExchange"))
    assert(bIdx >= 0, s"expected a broadcast label join:\n$plan")
    lines.zipWithIndex.filter(_._1.matches(".*\\b(Sort|Window)\\b.*")).foreach {
      case (l, i) =>
        val owner = lines.take(i).reverse
          .find(p => p.contains("BroadcastExchange") && indent(p) < indent(l))
        assert(owner.isDefined,
          s"Sort/Window outside the broadcast label branch (corpus-scale sort):\n$l\n$plan")
    }
  }
}
