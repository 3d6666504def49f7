package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling/mixing/sharding: membership must be a pure
  * function of (seed, id) — identical across runs AND partition layouts —
  * with expected sizes tracking the requested fractions.
  */
class SamplingSpec extends SparkSpec {

  private def docs = {
    val s = spark; import s.implicits._
    (0 until 2000).map(i =>
      (i.toLong, s"src${i % 4}", s"word${i % 7} " * (1 + i % 5)))
      .toDF("doc_id", "source", "text")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("sample: deterministic, partition-independent, ~fraction sized") {
    val a = ids(Sampling.sample(docs, 0.5, seed = 7))
    val b = ids(Sampling.sample(docs, 0.5, seed = 7))
    val c = ids(Sampling.sample(docs.repartition(13), 0.5, seed = 7))
    assert(a == b && a == c, "membership must not depend on run or layout")
    assert(math.abs(a.size - 1000) < 100, s"got ${a.size} of 2000 at 0.5")
    // a different seed draws a genuinely different sample
    assert(ids(Sampling.sample(docs, 0.5, seed = 8)) != a)
    // nested property: fraction 0.25 with the same seed is a subset of 0.5
    // (thresholding one hash, not re-drawing)
    val q = ids(Sampling.sample(docs, 0.25, seed = 7))
    assert(q.subsetOf(a))
  }

  test("stratified: per-stratum fractions; unlisted strata drop") {
    val out = Sampling.stratified(docs,
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), seed = 7)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 500L) // fraction 1.0 keeps everything
    assert(!bySrc.contains("src2") && !bySrc.contains("src3"))
    assert(math.abs(bySrc("src1") - 250L) < 60)
  }

  test("shards: stable, uniform-ish, in range, layout-independent") {
    val sh = Sampling.assignShards(docs, nShards = 8)
    val again = Sampling.assignShards(docs.repartition(17), nShards = 8)
    val m1 = sh.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = again.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == m2)
    assert(m1.values.forall(s => s >= 0 && s < 8))
    val sizes = m1.values.groupBy(identity).values.map(_.size)
    assert(sizes.size == 8 && sizes.forall(n => n > 150 && n < 350))
  }

  test("mixture: binding source kept whole, others scaled to the weights") {
    val s = spark; import s.implicits._
    // src0: 100 docs at weight 3 binds (n/w = 33.3); src1: 1000 docs at
    // weight 7 scales to C*w/n = 7/30 ≈ 233 docs. Weight 3.0 makes the
    // binding source's n/w INEXACT in doubles, exercising the explicit
    // full-hash-space clamp (a bare floor could land at 2^24 - 1).
    val skewed = ((0 until 100).map(i => (i.toLong, "src0")) ++
      (1000 until 2000).map(i => (i.toLong, "src1")))
      .toDF("doc_id", "source")
    val out = Sampling.mixture(skewed, Map("src0" -> 3.0, "src1" -> 7.0))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 100L, "binding source must be kept whole")
    assert(math.abs(bySrc("src1") - 233L) < 60, s"src1=${bySrc("src1")}")
    // unlisted sources are dropped entirely
    val extra = skewed.unionByName(Seq((5000L, "src9")).toDF("doc_id", "source"))
    assert(!Sampling.mixture(extra, Map("src0" -> 1.0, "src1" -> 1.0))
      .select("source").collect().map(_.getString(0)).contains("src9"))
  }

  test("property: sample/mixture/shards identical under repartition(1) vs (64)") {
    // the core determinism claim the sampling design rests on: membership
    // is a pure function of (seed, id) — NEVER of partition layout.
    // ScalaCheck draws (seed, fraction, weight) combos; each is checked at
    // the two extreme layouts.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val comboGen = for {
      seed <- Gen.choose(0L, 1000000L)
      frac <- Gen.choose(0.05, 0.95)
      w0 <- Gen.choose(0.5, 8.0)
      w1 <- Gen.choose(0.5, 8.0)
      shards <- Gen.choose(2, 32)
    } yield (seed, frac, w0, w1, shards)
    val d1 = docs.repartition(1)
    val d64 = docs.repartition(64)
    (1 to 6).foreach { trial =>
      val (seed, frac, w0, w1, shards) =
        comboGen(Gen.Parameters.default, Seed(trial.toLong)).get
      assert(ids(Sampling.sample(d1, frac, seed)) ==
        ids(Sampling.sample(d64, frac, seed)), s"sample trial $trial")
      val weights = Map("src0" -> w0, "src1" -> w1, "src2" -> 1.0)
      assert(ids(Sampling.mixture(d1, weights, seed = seed)) ==
        ids(Sampling.mixture(d64, weights, seed = seed)), s"mixture trial $trial")
      def shardMap(df: org.apache.spark.sql.DataFrame) =
        Sampling.assignShards(df, shards, seed).select("doc_id", "shard")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shardMap(d1) == shardMap(d64), s"shards trial $trial")
    }
  }

  test("clusterBalanced: per-cluster cap, deterministic, layout-independent") {
    val s = spark; import s.implicits._
    // 3 tight clusters along coordinate axes, 30/12/6 members
    def vec(axis: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(4)(0.01f * jitter)
      a(axis) = 1.0f; a
    }
    val rows = (0 until 30).map(i => (i.toLong, vec(0, i % 5))) ++
      (100 until 112).map(i => (i.toLong, vec(1, i % 5))) ++
      (200 until 206).map(i => (i.toLong, vec(2, i % 5)))
    val vecs = rows.toDF("vec_id", "embedding")
    val cents = Seq((0L, vec(0, 0)), (1L, vec(1, 0)), (2L, vec(2, 0)))
      .toDF("centroid_id", "embedding")
    def sel(df: org.apache.spark.sql.DataFrame) =
      Sampling.clusterBalanced(df, cents, cap = 8, seed = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = sel(vecs)
    val byCluster = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCluster == Map(0L -> 8, 1L -> 8, 2L -> 6),
      s"caps: big clusters flattened to 8, small kept whole: $byCluster")
    assert(a == sel(vecs.repartition(9)), "selection must be layout-independent")
    assert(a.forall(_._3 <= 8L))
  }

  test("packSequences: bins hold ~budget tokens, deterministic, layout-independent") {
    val s = spark; import s.implicits._
    def packed(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, budget = 40L, nShards = 2, seed = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val a = packed(docs)
    assert(a == packed(docs.repartition(11)), "packing must be layout-independent")
    // every doc lands exactly once; bins advance monotonically with order
    assert(a.size == 2000)
    val byShardBin = a.groupBy(x => (x._2, x._4)).view
      .mapValues(_.toSeq.map(_._3).sum).toMap
    // exclusive-cumsum binning: every non-final bin's total lands in
    // (budget - maxDoc, budget + maxDoc); docs here are 1..5 tokens
    val maxBin = byShardBin.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    byShardBin.foreach { case ((shard, bin), tot) =>
      if (bin < maxBin(shard))
        assert(tot > 40L - 5 && tot < 40L + 5, s"bin ($shard,$bin) total $tot")
    }
  }

  test("property: packSequences exporter contract — overflow bound, lossless reassembly") {
    // the contract a pre-training exporter relies on: (1) every input doc
    // lands in exactly one (shard, bin) slot — concatenating bins in
    // (shard, bin, pack_order) order reproduces the input set exactly;
    // (2) a bin only ever exceeds `budget` by its LAST doc's overflow
    // (docs are atomic): total - last_doc_tokens < budget, always.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark; import s.implicits._
    val comboGen = for {
      budget <- Gen.choose(10L, 200L)
      nShards <- Gen.choose(1, 8)
      seed <- Gen.choose(0L, 1000000L)
      nDocs <- Gen.choose(50, 300)
      maxLen <- Gen.choose(1, 30) // > budget/10: docs can overflow whole bins
    } yield (budget, nShards, seed, nDocs, maxLen)
    (1 to 5).foreach { trial =>
      val (budget, nShards, seed, nDocs, maxLen) =
        comboGen(Gen.Parameters.default, Seed(trial.toLong)).get
      val d = (0 until nDocs).map(i =>
        (i.toLong, ("w " * (1 + (i * 7919) % maxLen)).trim)).toDF("doc_id", "text")
      val out = Sampling.packSequences(d, budget, nShards, seed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // lossless: every doc exactly once
      assert(out.length == nDocs, s"trial $trial: ${out.length} rows")
      assert(out.map(_._1).toSet == (0 until nDocs).map(_.toLong).toSet,
        s"trial $trial: reassembled id set differs")
      // overflow bound per (shard, bin)
      out.groupBy(x => (x._2, x._4)).foreach { case ((shard, bin), rows) =>
        val sorted = rows.sortBy(_._5)
        val tot = sorted.map(_._3).sum
        val last = sorted.last._3
        assert(tot - last < budget,
          s"trial $trial bin($shard,$bin): total $tot - last $last >= budget $budget")
      }
      // walk-order sanity: pack_order is 1..n per shard and bins never
      // decrease along it (a doc larger than a whole bin may SKIP bin
      // indexes, so gaps are legal; regressions are not)
      out.groupBy(_._2).foreach { case (shard, rows) =>
        val sorted = rows.sortBy(_._5)
        assert(sorted.map(_._5).toSeq == (1L to rows.length.toLong),
          s"trial $trial shard $shard: pack_order not consecutive")
        val bins = sorted.map(_._4)
        assert(bins.zip(bins.drop(1)).forall { case (a, b) => a <= b },
          s"trial $trial shard $shard: bin regressed along walk order")
      }
    }
  }

  test("tokenBudget: exact ordered prefix per stratum; approx twin tracks mass") {
    val s = spark; import s.implicits._
    // doc i has exactly i+1 tokens; budget 10 per source keeps the prefix
    // 1+2+3+4 = 10 -> docs 0..3 for srcA; srcB all small, all kept
    val d = ((0 until 6).map(i => (i.toLong, "srcA", ("w " * (i + 1)).trim)) ++
      (10 until 13).map(i => (i.toLong, "srcB", "w w"))).toDF("doc_id", "source", "text")
    val kept = Sampling.tokenBudget(d, budget = 10L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 10L, 11L, 12L))
    // approx: expected token mass ~= budget, membership deterministic
    val big = docs
    val approx1 = ids(Sampling.tokenBudgetApprox(big, budget = 1000L, seed = 3))
    val approx2 = ids(Sampling.tokenBudgetApprox(big.repartition(5), budget = 1000L, seed = 3))
    assert(approx1 == approx2)
    // budget is PER STRATUM: 4 sources x 1000 expected mass each
    val mass = Sampling.tokenBudgetApprox(big, budget = 1000L, seed = 3)
      .agg(sum(TextAnalysis.tokenCount(col("text")))).first().getLong(0)
    assert(mass > 2800L && mass < 5200L, s"token mass $mass vs 4x1000 budget")
  }

  test("chunkSequences: strided windows cover the doc, last reaches the end") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: starts 1,4,7
      (2L, (1 to 12).map(i => s"t$i").mkString(" ")), // 12 toks: starts 1,4,7,10
      (3L, "a b c")                                   // <= maxLen: one chunk
    ).toDF("doc_id", "text")
    val out = Sampling.chunkSequences(d, maxLen = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("chunk"))).toMap
    assert(out((1L, 0L)) == (4L, "t1 t2 t3 t4"))
    assert(out((1L, 1L)) == (4L, "t4 t5 t6 t7"))
    assert(out((1L, 2L)) == (4L, "t7 t8 t9 t10"))
    assert(!out.contains((1L, 3L)))
    // 12 tokens: ceil((12-4)/3) = 3 extra chunks; tail chunk is short
    assert(out((2L, 3L)) == (3L, "t10 t11 t12"))
    assert(out((3L, 0L)) == (3L, "a b c"))
    assert(out.count(_._1._1 == 3L) == 1)
    // stride == maxLen partitions exactly: concatenating chunks in order
    // reproduces the input tokens
    val exact = Sampling.chunkSequences(d.where($"doc_id" === 2L), maxLen = 4, stride = 4)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk")).mkString(" ")
    assert(exact == (1 to 12).map(i => s"t$i").mkString(" "))
  }

  test("temperatureMixture: alpha flattens toward uniform; alpha=1 keeps all") {
    val s = spark; import s.implicits._
    val d = ((1 to 50).map(i => (i.toLong, "small")) ++
      (101 to 300).map(i => (i.toLong, "large"))).toDF("doc_id", "source")
    // weights n^0.5: small 50 -> 7071068, large 200 -> 14142136
    val w = Sampling.temperatureWeights(d, alpha = 0.5).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("weight_micro")).toMap
    assert(w == Map("small" -> 7071068L, "large" -> 14142136L))
    // binding source (small) kept whole; large's keep fraction is
    // C*w/n = (50*sqrt(200))/(200*sqrt(50)) = 0.5 -> ~100 of 200
    val out = Sampling.temperatureMixture(d, alpha = 0.5, seed = 7)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(out("small") == 50L)
    assert(out("large") > 70L && out("large") < 130L, s"large=${out("large")}")
    // alpha = 1: w proportional to n -> every source binding -> identity
    assert(Sampling.temperatureMixture(d, alpha = 1.0).count() == 250L)
    // layout independence
    val a = Sampling.temperatureMixture(d, 0.5, seed = 7).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.temperatureMixture(d.repartition(13), 0.5, seed = 7).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(a == b)
  }

  test("unimaxAllocation: water-filling matches the hand-computed greedy") {
    val s = spark; import s.implicits._
    // langs with 10 / 20 / 100 tokens; maxEpochs 2 -> caps 20 / 40 / 200
    val d = Seq(
      (0L, "a", ("w " * 10).trim),
      (1L, "b", ("w " * 20).trim),
      (2L, "c", ("w " * 100).trim)).toDF("doc_id", "lang", "text")
    def alloc(budget: Long) =
      Sampling.unimaxAllocation(d, budget, maxEpochs = 2).collect()
        .map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("epochs_milli"))).toMap
    // budget 100: greedy caps a (20 <= 100/3) and b (40 <= 80/2), then
    // waters c at (100-60)/1 = 40 -> 0.4 epochs
    assert(alloc(100L) ==
      Map("a" -> (20L, 2000L), "b" -> (40L, 2000L), "c" -> (40L, 400L)))
    // budget >= total capacity: everything capped at maxEpochs
    assert(alloc(1000L) ==
      Map("a" -> (20L, 2000L), "b" -> (40L, 2000L), "c" -> (200L, 2000L)))
    // budget 30: even the smallest cap exceeds the uniform share -> no
    // caps, everyone gets budget/k = 10
    assert(alloc(30L).view.mapValues(_._1).toMap ==
      Map("a" -> 10L, "b" -> 10L, "c" -> 10L))
    // layout independence: pure integer arithmetic over the lang table
    val re = Sampling.unimaxAllocation(d.repartition(7), 100L, 2).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("alloc_tokens")).toMap
    assert(re == Map("a" -> 20L, "b" -> 40L, "c" -> 40L))
  }

  test("leakageSafeSplit: no near-dup component ever straddles the split") {
    val s = spark; import s.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain components {1..4}, {10,11}, plus transitive {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, pairs, holdoutFraction = 0.3, seed = 9)
    assert(out.count() === 200L, "split must preserve every doc exactly once")
    // every clustered doc shares its cluster's split
    val comp = Dedup.duplicateComponents(pairs)
    val straddling = out.join(comp, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("k"))
      .where($"k" > 1).count()
    assert(straddling === 0L, "a component in two splits is leakage")
    // both splits are non-trivially populated at fraction 0.3 over 200 docs
    val sizes = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.getOrElse("holdout", 0L) > 20L && sizes("train") > 100L, sizes.toString)
    // determinism across layouts
    val re = Sampling.leakageSafeSplit(docs.repartition(13), pairs, 0.3, seed = 9)
      .orderBy("doc_id").select("split").as[String].collect()
    val first = out.orderBy("doc_id").select("split").as[String].collect()
    assert(re.toSeq == first.toSeq)
  }
}
