package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river"),      // near dup of 1
      (4L, "completely different text about spark catalyst optimizer rules engine"),
      (5L, "another unrelated document mentioning parquet columnar storage format")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical content, canonical = min id") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 4)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("canonical_id") == 1L)
    assert(Dedup.exactKeep(docs).count() == 4)
  }

  test("ngram jaccard finds near-dups and only near-dups") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5).collect()
    val keys = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(keys.contains((1L, 2L))) // exact dup: jaccard 1.0
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L))) // near dup
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L))
    val exact = pairs.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L).get
    assert(exact.getAs[Double]("jaccard") == 1.0)
  }

  test("ngram pair-budget observe reports candidate work and cap drops (d2→d2b routing signal)") {
    val s = spark; import s.implicits._
    // engineered postings, cap = 2:
    //   "c c c" in all 3 docs (df=3) -> DROPPED by the cap;
    //   "c c a","c a a","a a a" shared by docs 1,2 (df=2) -> 1 pair each;
    //   doc-unique shingles (df=1) -> no pairs
    val d = Seq(
      (1L, "c c c a a a"),
      (2L, "c c c a a a"),
      (3L, "c c c z z z")).toDF("doc_id", "text")
    val (out, name) =
      Dedup.ngramJaccardPairsWithSignal(d, n = 3, threshold = 0.5, maxDocsPerShingle = 2)
    val rows = out.collect()
    // result sanity: docs 1,2 share 3 kept shingles of 4 -> jaccard 0.6
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(rows.head.getAs[Double]("jaccard") == 0.6)
    val m = out.queryExecution.observedMetrics.get(name)
    assert(m.isDefined, s"plan must carry the observe under the returned name $name")
    // candidate_pairs = Σ df(df−1)/2 over KEPT postings = 3·1 = 3;
    // capped_shingles counts the dropped stopword shingle — which also
    // pins that the cap filter does NOT push below the CollectMetrics
    // node (pushed-down it would read 0); n_postings = 7 distinct shingles
    assert(m.get.getAs[Long]("candidate_pairs") == 3L)
    assert(m.get.getAs[Long]("capped_shingles") == 1L)
    assert(m.get.getAs[Long]("n_postings") == 7L)
  }

  test("cosine pairs WithSignal returns the observe name (None when uncapped)") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(0.99f, 0.1f)),
      (3L, 0, Seq(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val (capped, nm) =
      Dedup.embeddingCosinePairsWithSignal(vecs, "label", 0.9, maxBucketSize = 2)
    assert(nm.exists(_.startsWith("graft.cosine_bucket_splits.")))
    capped.collect()
    assert(capped.queryExecution.observedMetrics.contains(nm.get))
    val (_, none) = Dedup.embeddingCosinePairsWithSignal(
      vecs, "label", 0.9, maxBucketSize = Int.MaxValue)
    assert(none.isEmpty, "exhaustive form carries no lossy-mode signal")
  }

  test("LSH-prefiltered Jaccard verify equals the exhaustive operator (d2b ≡ d2)") {
    val cand = Dedup.minhashLshCandidatesPortable(docs, k = 16, bands = 4)
    val verified = Dedup.jaccardVerifyCandidates(docs, cand, n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    val exhaustive = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b").collect().map(_.toSeq)
    // full row equality: pair set AND n_common/size/jaccard values
    assert(verified.toSeq == exhaustive.toSeq,
      "verification of LSH candidates must reproduce the exhaustive rows")
  }

  test("jaccardVerifyCandidates drops below-threshold candidates (LSH false positives)") {
    val s = spark; import s.implicits._
    // hand-planted candidate list with a true pair and a junk pair
    val cand = Seq((1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerifyCandidates(docs, cand, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L)), "the dissimilar candidate must not survive verification")
  }

  test("minhash LSH candidates are a superset of true near-dups here") {
    val cand = Dedup.minhashLshCandidates(docs, k = 16, bands = 8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(cand.contains((1L, 2L)), "identical docs always share all bands")
    assert(cand.contains((1L, 3L)), "0.76-jaccard pair should collide in >=1 of 8 bands")
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig(1L) == sig(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)),
      s"near-dup hamming ${ham(sig(1L), sig(3L))} should beat unrelated ${ham(sig(1L), sig(4L))}")
  }

  test("portable minhash LSH agrees with the fast variant on true near-dups") {
    val fast = Dedup.minhashLshCandidates(docs, k = 16, bands = 8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val portable = Dedup.minhashLshCandidatesPortable(docs, k = 16, bands = 8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // both must find the guaranteed (identical-doc) pair and the near-dup
    assert(fast.contains((1L, 2L)) && portable.contains((1L, 2L)))
    assert(fast.contains((1L, 3L)) && portable.contains((1L, 3L)))
  }

  test("portable simhash: identical equal, near-dups closer than unrelated") {
    val sig = Dedup.simhashPortable(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sig(1L) == sig(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)))
  }

  test("incremental dedup drops seen hashes and in-batch copies") {
    val s = spark; import s.implicits._
    val existing = Dedup.fingerprints(
      Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text"))
    val incoming = Seq(
      (10L, "seen before"),   // hash already in the store -> dropped
      (11L, "brand new"),     // accepted
      (12L, "brand new"),     // in-batch copy of 11 -> dropped
      (13L, "another new")    // accepted
    ).toDF("doc_id", "text")
    val accepted = Dedup.incrementalExactKeep(incoming, existing)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(accepted == Set(11L, 13L))
    // advancing the frontier with the accepted batch makes a re-run a no-op
    val advanced = existing.unionByName(
      Dedup.fingerprints(incoming.where(col("doc_id").isin(11L, 13L))))
    assert(Dedup.incrementalExactKeep(incoming, advanced).count() == 0L)
  }

  test("bloom-prefiltered incremental dedup is bit-identical to the plain path") {
    val s = spark; import s.implicits._
    val existing = Dedup.fingerprints(
      (1L to 200L).map(i => (i, s"stored doc number $i")).toDF("doc_id", "text"))
    val incoming = (
      (150L to 250L).map(i => (i + 1000L, s"stored doc number $i")) ++ // 51 seen
      (300L to 400L).map(i => (i + 1000L, s"fresh doc number $i")) ++  // new
      Seq((9001L, "fresh doc number 300"))                             // in-batch copy
    ).toDF("doc_id", "text")
    val plain = Dedup.incrementalExactKeep(incoming, existing)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val bloomed = Dedup.incrementalExactKeepBloom(incoming, existing)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(bloomed == plain)
    // 1150..1200 seen (51 dropped), 1201..1250 new (50), 1300..1400 new
    // (101), 9001 in-batch copy of 1300 (dropped) -> 151 accepted
    assert(plain.size == 151)
    assert(!bloomed.contains(1150L) && bloomed.contains(1201L))
    // a tiny sketch (high fpp) still yields the exact result — false
    // positives only route extra rows through the anti-join
    val tiny = Dedup.incrementalExactKeepBloom(incoming, existing,
      expectedItems = 4L, numBits = 64L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(tiny == plain)
    // empty store: everything (in-batch deduped) is accepted
    val empty = existing.limit(0)
    assert(Dedup.incrementalExactKeepBloom(incoming, empty).count() ==
      Dedup.incrementalExactKeep(incoming, empty).count())
  }

  test("incremental LSH via the band index agrees with the batch variant") {
    val s = spark; import s.implicits._
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally different words with no shared shingles anywhere at all ok"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do")
    ).toDF("doc_id", "text")
    // the incoming batch repeats doc 1 nearly verbatim
    val incoming = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (102L, "unrelated incoming content that matches nothing in the corpus x y")
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalLshCandidates(
        Dedup.minhashBands(incoming), Dedup.minhashBands(base))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.contains((1L, 101L)))
    assert(!inc.exists(_._2 == 102L))
    // batch variant over the union finds the same cross pairs
    val batch = Dedup.minhashLshCandidates(base.unionByName(incoming))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.forall(batch.contains))
  }

  test("nearDupKeep drops non-canonical members of dup clusters") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
    val kept = Dedup.nearDupKeep(docs, pairs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // cluster {1,2,3} -> keep 1; singletons 4, 5 kept
    assert(kept == Set(1L, 4L, 5L))
  }

  test("embedding cosine pairs within buckets") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0, Seq(0.999f, 0.01f, 0.0f)), // near dup of 1
      (3L, 0, Seq(0.0f, 1.0f, 0.0f)),
      (4L, 1, Seq(1.0f, 0.0f, 0.0f))     // other bucket: never compared to 1
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingCosinePairs(vecs, "label", 0.99).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("id_a") == 1L && out(0).getAs[Long]("id_b") == 2L)
  }

  test("capped cosine pairs: no-op under the cap, bounded and recall-safe over it") {
    val s = spark; import s.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame, cap: Int) =
      Dedup.embeddingCosinePairs(df, "label", 0.95, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one bucket of 40 vectors: 10 groups of 4 near-identical members
    // spread across orthogonal-ish directions, dim 8
    def vec(group: Int, member: Int): Seq[Float] = {
      val a = Array.fill(8)(0.001f * member)
      a(group % 8) = 1.0f; a(7 - group % 8) += 0.1f * (group / 8); a.toSeq
    }
    val rows = for (g <- 0 until 10; m <- 0 until 4)
      yield ((g * 10 + m).toLong, 0, vec(g, m))
    val vecs = rows.toDF("vec_id", "label", "embedding")
    val uncapped = pairs(vecs, Int.MaxValue)
    assert(uncapped.nonEmpty)
    // cap >= bucket size: bits = 0, identical results (exactness claim)
    assert(pairs(vecs, 40) == uncapped)
    // binding cap: output is a subset (sub-bucketing only removes
    // candidate pairs, never invents them) and near-identical groups —
    // the near-DUPLICATE range the operator exists for — survive: every
    // group contributes at least its tightest pairs
    val capped = pairs(vecs, 10)
    assert(capped.subsetOf(uncapped))
    val groupsWithPair = capped.map(_._1 / 10).intersect(capped.map(_._2 / 10))
    assert((0 until 10).forall(g => groupsWithPair.contains(g.toLong)),
      s"every near-dup group must retain in-group pairs: $groupsWithPair")
    // deterministic and layout-independent (md5 signs, no RNG state)
    assert(pairs(vecs.repartition(7), 10) == capped)
  }

  test("capped cosine pairs emit the lossy-mode bucket-split observation") {
    val s = spark; import s.implicits._
    def vec(group: Int, member: Int): Seq[Float] = {
      val a = Array.fill(8)(0.001f * member)
      a(group % 8) = 1.0f; a(7 - group % 8) += 0.1f * (group / 8); a.toSeq
    }
    val rows = for (g <- 0 until 10; m <- 0 until 4)
      yield ((g * 10 + m).toLong, 0, vec(g, m))
    val vecs = rows.toDF("vec_id", "label", "embedding")
    def splitMetric(cap: Int): (Long, Long) = {
      val df = Dedup.embeddingCosinePairs(vecs, "label", 0.95, maxBucketSize = cap)
      df.collect()
      val m = df.queryExecution.observedMetrics.collectFirst {
        case (name, row) if name.startsWith("graft.cosine_bucket_splits.") =>
          (row.getAs[Long]("split_buckets"), row.getAs[Long]("n_buckets"))
      }
      assert(m.isDefined, "capped run must carry the split observation")
      m.get
    }
    // binding cap: the signal reports the bucket split (lossy mode ON)
    val (split10, n10) = splitMetric(10)
    assert(split10 == 1L && n10 == 1L)
    // cap >= bucket size: zero splits certifies exhaustive results
    val (split40, _) = splitMetric(40)
    assert(split40 == 0L)
  }

  test("semantic dedup: within-cluster near-dups drop, lowest id survives") {
    val s = spark; import s.implicits._
    // two tight direction groups; nlist = 1 puts everything in one
    // cluster so the within-cluster prune + keep-lowest rule is the
    // thing under test (centroid choice is hash-order-dependent and
    // could otherwise split a group across self-assigned clusters —
    // cluster-boundary behavior is the oracle row's job)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.01f)),
      (2L, Seq(0.999f, 0.01f, 0.0f, 0.0f)),  // near-dup of 1
      (3L, Seq(0.998f, 0.0f, 0.02f, 0.0f)),  // near-dup of 1 and 2
      (10L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (11L, Seq(0.01f, 0.999f, 0.0f, 0.0f))  // near-dup of 10
    ).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(vecs, threshold = 0.98, nlist = 1)
      .collect().map(_.getLong(0)).toSet
    // each near-dup group keeps exactly its lowest id; cross-group
    // cosines (~0) never pair
    assert(kept == Set(1L, 10L))
    // deterministic under re-partitioning (hashed-id seeding, no RNG)
    val kept2 = Dedup.semanticDedup(vecs.repartition(5), threshold = 0.98, nlist = 1)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
  }

  test("duplicateComponents: transitive closure where nearDupKeep's pair rule is not") {
    val s = spark; import s.implicits._
    // edge set {(B,C), (A,C)} with A=1 < B=2 < C=3: B is never an id_b,
    // so the pair rule keeps {A, B}; the component rule keeps only A.
    // Second component 10-20 (chain via shared neighbor), singleton 99.
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 20L)).toDF("id_a", "id_b")
    val comp = Dedup.duplicateComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 20L -> 10L))

    val docs = Seq(1L, 2L, 3L, 10L, 20L, 99L).toDF("doc_id")
      .withColumn("text", lit("t"))
    assert(Dedup.componentKeep(docs, pairs).collect().map(_.getLong(0)).toSet
      == Set(1L, 10L, 99L), "one survivor per component; singletons pass through")
    assert(Dedup.nearDupKeep(docs, pairs).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 10L, 99L), "the pair rule misses the transitive B~C~A chain")
  }

  test("duplicateComponents: long chain converges in O(log n) rounds, layout-independent") {
    val s = spark; import s.implicits._
    // path graph 0-1-...-63: one component, diameter 63 — one-hop label
    // propagation would need 63 rounds; star contraction is O(log² n)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.duplicateComponentsRounds(chain.repartition(7))
    val comp = labels.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(comp.size == 64 && comp.values.forall(_ == 0L))
    assert(rounds <= 7, s"64-chain must close in <=7 contraction rounds, took $rounds")
    // non-convergence within maxIters must throw, not return garbage
    intercept[IllegalStateException] {
      Dedup.duplicateComponents(chain, maxIters = 1)
    }
  }

  test("duplicateComponents: random graphs equal a driver-side union-find") {
    // property pin for the contraction + signature-gated convergence:
    // labels on arbitrary random graphs must equal the min-id component
    // labeling of a trusted union-find (protects against a false-early
    // fixpoint from the one-action signature check)
    val s = spark; import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgesGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield es
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    (1 to 8).foreach { trial =>
      val pairs = edgesGen(Gen.Parameters.default, Seed(trial.toLong)).get
      val expected = unionFind(pairs)
      val got = Dedup.duplicateComponents(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
        .toMap
      assert(got == expected, s"trial $trial: $got != $expected (pairs=$pairs)")
    }
  }

  test("dupWeights: geometric worth of copies, canonical = min id") {
    val s = spark; import s.implicits._
    val d = Seq(
      (5L, "aaa"), (1L, "aaa"), (9L, "aaa"), // m=3
      (2L, "bbb"), (7L, "bbb"),              // m=2
      (3L, "ccc")                            // m=1
    ).toDF("doc_id", "text")
    val out = Dedup.dupWeights(d).collect()
      .map(r => r.getAs[Long]("canonical_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("weight_micro"))).toMap
    // decay 0.5: weight(m) = 2 - 2^(1-m) -> 1, 1.5, 1.75
    assert(out == Map(
      1L -> (3L, 1750000L), 2L -> (2L, 1500000L), 3L -> (1L, 1000000L)))
  }

  test("native minhash signatures equal the declarative explode+groupBy formulation") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely here now"),
      (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (5L, "too short"),                                   // < 3 tokens: no row
      (6L, "exactly three tokens")                         // single shingle
    ).toDF("doc_id", "text")
    val native = Dedup.minhashSignaturesPortable(docs, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the declarative reference the native expression replaced: one md5
    // per shingle, h1/h2 = hex chars 1-12 / 13-24 as unsigned bigints,
    // lane i = min((h1 + i*h2) mod 2^40) — exactly the oracle-side
    // formulation
    val sh = Dedup.shingleArrays(docs).select(col("doc_id"),
      explode(col("shingles")).as("shingle"))
      .withColumn("hx", md5(col("shingle")))
      .withColumn("h1", conv(substring(col("hx"), 1, 12), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("hx"), 13, 12), 16, 10).cast("long"))
    val mins = (0 until 16).map(i =>
      min((col("h1") + lit(i.toLong) * col("h2")) %
        lit(graft.functions.MinhashMd5.LaneMod)).as(s"h$i"))
    val declarative = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(i => col(s"h$i")): _*).as("signature"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === Set(1L, 2L, 3L, 4L, 6L), "short docs drop")
    assert(native === declarative, "native MinhashMd5 must be bit-identical")
    assert(native(1L) === native(4L), "exact dups share signatures")
  }
}
