package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5GramHashesSpec extends SparkSpec {

  test("byte-identical to the declarative md5/substring/conv chain") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "bravo", "c", "Δδ", "tokens", "x1", "the")
    val docs = ((1L to 40L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
    } :+ (99L, Seq.empty[String])).toDF("id", "toks")
    for (k <- Seq(1, 2, 4)) {
      val native = call_function(GraftFunctions.md5GramHashesName,
        col("toks"), lit(k))
      // the replaced chain (guarded like the old portable path: only
      // meaningful for size >= k; compare on that slice)
      val decl = graft.datapipe.Winnowing.gramHashesMd5Declarative(col("toks"), k)
      val bad = docs.where(size(col("toks")) >= k)
        .select(col("id"), native.as("n"), decl.as("d"))
        .where(not(col("n") === col("d")))
        .count()
      assert(bad == 0L, s"value mismatch at k=$k")
      // below k tokens: empty array (the declarative chain's
      // greatest(...,1) truncated-slice boundary row is filtered out by
      // every caller before use)
      val short = docs.where(size(col("toks")) < k)
        .select(size(native).as("n")).collect()
      assert(short.forall(_.getInt(0) == 0))
    }
  }

  test("null tokens skip both bytes and separator, matching array_join") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    // grams with a null in every position (leading / interior / trailing /
    // all-null): array_join drops the element AND its separator, so e.g.
    // ["a", null, "b"] at k=3 must hash as "a b" (single space), not "a  b"
    val docs = Seq(
      (1L, Seq[String](null, "a", "b", null, "c")),
      (2L, Seq[String]("x", null, null, "y")),
      (3L, Seq[String](null, null, null)),
      (4L, Seq[String]("lone", null))
    ).toDF("id", "toks")
    for (k <- Seq(2, 3)) {
      val native = call_function(GraftFunctions.md5GramHashesName,
        col("toks"), lit(k))
      val decl = graft.datapipe.Winnowing.gramHashesMd5Declarative(col("toks"), k)
      val bad = docs.where(size(col("toks")) >= k)
        .select(col("id"), native.as("n"), decl.as("d"))
        .where(not(col("n") === col("d")))
        .count()
      assert(bad == 0L, s"null-token mismatch at k=$k")
    }
  }

  test("24-bit range and determinism under repartition") {
    val s = spark; import s.implicits._
    GraftFunctions.register(s)
    val docs = (1L to 30L).map(i => (i, (1 to 10).map(j => s"w${(i + j) % 7}")))
      .toDF("id", "toks")
    def vals(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), explode(call_function(GraftFunctions.md5GramHashesName,
        col("toks"), lit(3))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = vals(docs)
    assert(a.forall { case (_, h) => h >= 0L && h < (1L << 24) })
    assert(a == vals(docs.repartition(5)))
  }
}
