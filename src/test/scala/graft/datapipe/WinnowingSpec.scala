package graft.datapipe

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {

  private val sharedRun =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, s"intro words here $sharedRun closing remark one"),
      (2L, s"different opening tokens $sharedRun another distinct tail"),
      (3L, "totally unrelated content about spark catalyst partitions shuffle"),
      (4L, "tiny doc"),            // < k tokens: no fingerprints
      (5L, "just four tokens here") // k tokens, 1 gram < w: one window
    ).toDF("doc_id", "text")
  }

  private def fpsOf(portable: Boolean) =
    Winnowing.fingerprints(docs, k = 4, w = 4, portable = portable).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos").toInt, r.getAs[Long]("fp")))

  test("detection guarantee: docs sharing >= k+w-1 tokens share a fingerprint") {
    for (portable <- Seq(false, true)) {
      val fps = fpsOf(portable)
      val f1 = fps.collect { case (1L, _, h) => h }.toSet
      val f2 = fps.collect { case (2L, _, h) => h }.toSet
      val f3 = fps.collect { case (3L, _, h) => h }.toSet
      assert((f1 & f2).nonEmpty, s"shared 10-token run undetected (portable=$portable)")
      assert((f1 & f3).isEmpty && (f2 & f3).isEmpty,
        s"unrelated docs matched (portable=$portable)")
    }
  }

  test("coverage: every window of w grams contains a selected position") {
    val fps = fpsOf(portable = true)
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 1: 16 tokens -> 13 grams -> windows start at 0..9
    val sel1 = byDoc(1L)
    for (s <- 0 to 9)
      assert((s to s + 3).exists(sel1.contains), s"window at $s uncovered")
    // density ~ 2/(w+1): far fewer fingerprints than grams
    assert(sel1.size < 13 && sel1.size >= 3)
  }

  test("boundary docs: < k tokens none, < w grams exactly one") {
    val fps = fpsOf(portable = true)
    assert(!fps.exists(_._1 == 4L))
    assert(fps.count(_._1 == 5L) == 1)
  }

  test("deterministic under repartition") {
    val a = Winnowing.fingerprints(docs, k = 4, w = 4, portable = true)
      .collect().map(_.toSeq).toSet
    val b = Winnowing.fingerprints(docs.repartition(7), k = 4, w = 4, portable = true)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("native WinnowSelect ≡ declarative fold selection (fixtures + randomized corpus)") {
    val s = spark; import s.implicits._
    // portable=true pins the md5-struct input path; portable=false pins
    // the native GramHashes array<long> input path (same hash values in
    // both arms by construction — the declarative twin wraps the same
    // native gram hashes into structs), so the parity is about SELECTION
    def both(df: org.apache.spark.sql.DataFrame, k: Int, w: Int, portable: Boolean) = {
      val a = Winnowing.fingerprints(df, k, w, portable)
        .collect().map(_.toSeq).toSet
      val b = Winnowing.fingerprintsDeclarative(df, k, w, portable)
        .collect().map(_.toSeq).toSet
      (a, b)
    }
    for (portable <- Seq(true, false)) {
      val (a1, b1) = both(docs, 4, 4, portable)
      assert(a1 == b1, s"fixture parity (portable=$portable)")
    }
    // randomized corpus over a TINY vocabulary: repeated grams force
    // equal hashes inside windows, exercising the rightmost-tie rule the
    // deque's >= back-pop must reproduce exactly
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c")
    val randDocs = (1L to 60L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for ((k, w) <- Seq((2, 3), (3, 1), (1, 4), (4, 6)); portable <- Seq(true, false)) {
      val (a, b) = both(randDocs, k, w, portable)
      assert(a == b, s"randomized parity failed at k=$k w=$w portable=$portable")
    }
  }

  test("WinnowSelect unit semantics: rightmost tie, short array, dedup") {
    import graft.functions.WinnowSelect.selectRows
    // [3,5,3] w=3: one window, rightmost 3 (pos 2) wins the tie
    assert(selectRows(Seq((0, 3L), (1, 5L), (2, 3L)), 3) == Seq((2, 3L)))
    // fewer grams than w: single window over the whole array
    assert(selectRows(Seq((0, 9L), (1, 2L)), 5) == Seq((1, 2L)))
    // sliding: [5,3,5,1] w=2 -> windows select 3,3,1 -> dedup to 3,1
    assert(selectRows(Seq((0, 5L), (1, 3L), (2, 5L), (3, 1L)), 2) ==
      Seq((1, 3L), (3, 1L)))
    // all-equal hashes: every window selects its rightmost element
    assert(selectRows(Seq((0, 7L), (1, 7L), (2, 7L)), 2) ==
      Seq((1, 7L), (2, 7L)))
    assert(selectRows(Seq.empty, 3) == Seq.empty)
  }

  test("matches: shared-run pair surfaces, unrelated pairs do not") {
    val m = Winnowing.matches(docs, k = 4, w = 4, minShared = 2, portable = true)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("n_shared"))
      .toMap
    assert(m.contains((1L, 2L)) && m((1L, 2L)) >= 2L)
    assert(m.keySet == Set((1L, 2L)), s"unexpected pairs: ${m.keySet}")
  }
}
