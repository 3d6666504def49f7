package graft

import graft.SparkSpec

/** Proves the sf10 spot-correctness gate actually trips: each predicate
  * gets a synthetic INJECTED violation (the judge-asked failure drill)
  * plus a passing twin, so a scale-only wrongness class (overflow sign
  * flips, broken conservation, id-namespace collisions, non-monotone
  * pipelines, nondeterminism) cannot slide through a green sweep.
  */
class VerifyScaleSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("q1 invariants trip on conservation and bound violations") {
    val s = spark; import s.implicits._
    val good = Seq(("N", "O", 10.0, 100.0, 95.0, 7L))
      .toDF("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "count_order")
    assert(VerifyScale.checkQ1(good, 7L).isRight)
    // conservation: count_order must cover every lineitem row
    assert(VerifyScale.checkQ1(good, 8L).isLeft)
    // a silent wrap turns sums negative
    val wrapped = good.withColumn("sum_disc_price", lit(-3.2))
    assert(VerifyScale.checkQ1(wrapped, 7L).isLeft)
    // discount in [0,1) means disc <= base
    val over = good.withColumn("sum_disc_price", lit(101.0))
    assert(VerifyScale.checkQ1(over, 7L).isLeft)
  }

  test("a19 conservation trips on lost rows and off-grid windows") {
    val s = spark; import s.implicits._
    val slide = 300000000000L
    val good = Seq((0L, "click", 3L, 1.0), (slide, "click", 1L, 2.0))
      .toDF("win_start_ns", "event_type", "n", "sum_v")
    assert(VerifyScale.checkA19(good, 2L).isRight)
    assert(VerifyScale.checkA19(good, 3L).isLeft) // 2*3 != 4 covered
    val offGrid = Seq((17L, "click", 4L, 1.0))
      .toDF("win_start_ns", "event_type", "n", "sum_v")
    assert(VerifyScale.checkA19(offGrid, 2L).isLeft)
  }

  test("cosine pair bounds trip on out-of-range scores and dup pairs") {
    val s = spark; import s.implicits._
    val good = Seq((1L, 2L, 0.95), (1L, 3L, 0.31)).toDF("id_a", "id_b", "cosine")
    assert(VerifyScale.checkCosinePairs(good, 0.3).isRight)
    val below = Seq((1L, 2L, 0.1)).toDF("id_a", "id_b", "cosine")
    assert(VerifyScale.checkCosinePairs(below, 0.3).isLeft)
    val dup = good.union(good)
    assert(VerifyScale.checkCosinePairs(dup, 0.3).isLeft)
    val unordered = Seq((5L, 2L, 0.9)).toDF("id_a", "id_b", "cosine")
    assert(VerifyScale.checkCosinePairs(unordered, 0.3).isLeft)
  }

  test("subset check trips on ids outside the corpus") {
    val s = spark; import s.implicits._
    val corpus = Seq(1L, 2L, 3L).toDF("doc_id")
    val in = Seq(2L, 3L).toDF("doc_id")
    assert(VerifyScale.checkSubset(in, corpus, "doc_id").isRight)
    val out = Seq(2L, 99L).toDF("doc_id")
    assert(VerifyScale.checkSubset(out, corpus, "doc_id").isLeft)
  }

  test("curate monotonicity trips when a stage gains documents") {
    val s = spark; import s.implicits._
    val good = Seq(("1_input", 100L), ("2_lang", 80L), ("3_quality", 60L),
      ("6_curated_id_sum", 1234L)).toDF("stage", "n_docs")
    assert(VerifyScale.checkCurateCounts(good).isRight)
    val gain = Seq(("1_input", 100L), ("2_lang", 120L)).toDF("stage", "n_docs")
    assert(VerifyScale.checkCurateCounts(gain).isLeft)
  }

  test("z-order bounds trip on out-of-range values and lost rows") {
    val s = spark; import s.implicits._
    val good = Seq((1L, 0L), (2L, 65535L)).toDF("event_id", "zval")
    assert(VerifyScale.checkZOrder(good, 2L, bits = 8).isRight)
    assert(VerifyScale.checkZOrder(good, 3L, bits = 8).isLeft)
    val over = Seq((1L, 65536L)).toDF("event_id", "zval")
    assert(VerifyScale.checkZOrder(over, 1L, bits = 8).isLeft)
  }

  test("id-namespace check trips when real ids reach the 1e9 offset") {
    val s = spark; import s.implicits._
    assert(VerifyScale.checkIdNamespace(Seq(1L, 999999999L).toDF("doc_id")).isRight)
    // the r12 curate silent-wrongness class, injected
    assert(VerifyScale.checkIdNamespace(Seq(1L, 1000000000L).toDF("doc_id")).isLeft)
  }

  test("determinism check trips on run-to-run divergence") {
    val s = spark; import s.implicits._
    val stable = () => Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(VerifyScale.checkDeterminism(stable).isRight)
    var i = 0
    val unstable = () => { i += 1; Seq((i.toLong, "a")).toDF("id", "v") }
    assert(VerifyScale.checkDeterminism(unstable).isLeft)
  }

  test("determinism check trips on XOR-cancelling duplicate swaps (ADVICE r13)") {
    val s = spark; import s.implicits._
    // {a,a,b} vs {c,c,b}: equal counts, and the duplicated rows cancel
    // PAIRWISE under bit_xor, so (count, xor) alone pass both multisets
    // as identical — the sum-of-hashes component must catch the swap
    var i = 0
    val swapped = () => {
      i += 1
      (if (i == 1) Seq((1L, "a"), (1L, "a"), (2L, "b"))
       else Seq((3L, "c"), (3L, "c"), (2L, "b"))).toDF("id", "v")
    }
    assert(VerifyScale.checkDeterminism(swapped).isLeft,
      "equal-count duplicate swap must break the signature")
  }
}
