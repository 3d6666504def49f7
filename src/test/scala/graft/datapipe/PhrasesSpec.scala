package graft.datapipe

class PhrasesSpec extends graft.SparkSpec {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "new york is big"),
      (2L, "new york city"),
      (3L, "the big city")
    ).toDF("doc_id", "text")
  }

  test("pmiPhrases: hand-computed integer score, minCount + delta guards") {
    // unigrams: new 2, york 2, is 1, big 2, city 2, the 1 -> N = 10
    // pairs: (new,york) 2; all others 1
    // score(new,york) = (2-1)*10*1e6 / (2*2) = 2_500_000
    val out = Phrases.pmiPhrases(docs, minCount = 2, delta = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("w1") == "new" && r.getAs[String]("w2") == "york")
    assert(r.getAs[Long]("n_pair") == 2L)
    assert(r.getAs[Long]("n_w1") == 2L && r.getAs[Long]("n_w2") == 2L)
    assert(r.getAs[Long]("score_micro") == 2500000L)
  }

  test("pmiPhrases: n_pair == delta pairs are excluded even at minCount 1") {
    // delta 1 kills every count-1 pair; only (new,york) survives
    val out = Phrases.pmiPhrases(docs, minCount = 1, delta = 1).collect()
    assert(out.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet ==
      Set(("new", "york")))
  }

  test("pmiPhrases: minScoreMicro filters below-threshold pairs") {
    assert(Phrases.pmiPhrases(docs, minCount = 2, delta = 1,
      minScoreMicro = 3000000L).count() == 0L)
  }

  test("pmiPhrases: deterministic under repartition") {
    val a = Phrases.pmiPhrases(docs, minCount = 1, delta = 0)
      .collect().map(_.toSeq).toSet
    val b = Phrases.pmiPhrases(docs.repartition(5), minCount = 1, delta = 0)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 6)
  }
}
