package graft.datapipe

import graft.SparkSpec

/** ExactSubstr-style repeated-span removal: corpus-duplicated k-grams
  * keep their first (doc_id, pos) occurrence, every other occurrence's
  * tokens are removed, survivors reassemble in order.
  */
class SpanDedupSpec extends SparkSpec {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, "a b c d e"),       // keeper copies of "a b c" / "b c d"
      (1L, "x y a b c d z"),   // repeats both grams mid-document
      (2L, "p q r"),           // unique — untouched
      (3L, "a b c a b c"),     // every position covered by dup "a b c"
      (4L, "short"))           // below k — no grams, passes through
      .toDF("doc_id", "text")
  }

  test("kgramOccurrences emits one posting per gram start, none below k") {
    val occ = SpanDedup.kgramOccurrences(docs, k = 3).collect()
    assert(occ.length == 3 + 5 + 1 + 4) // docs 0,1,2,3; doc 4 has none
    assert(occ.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("removeDuplicatedSpans keeps first occurrence, strips the rest") {
    val out = SpanDedup.removeDuplicatedSpans(docs, k = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(0L) == ((5L, 0L, "a b c d e"))) // keeper copy untouched
    assert(out(1L) == ((7L, 4L, "x y z")))     // covered positions 2..5 removed
    assert(out(2L) == ((3L, 0L, "p q r")))
    assert(out(3L) == ((6L, 6L, "")))          // wholly duplicated document
    assert(out(4L) == ((1L, 0L, "short")))
  }

  test("reassembly plan: positional filter, no collect_list rebuild") {
    // the covered-position sets join back by id and a positional filter
    // drops slots in-place — the plan must not contain the old
    // posexplode-all-tokens + collect_list reassembly (which shuffled
    // the corpus token-by-token through two exchanges plus a sort)
    val plan = SpanDedup.removeDuplicatedSpans(docs, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan.take(800))
    assert(plan.contains("array_contains"), plan.take(800))
  }

  test("a corpus with no duplicated grams is returned verbatim") {
    val s = spark; import s.implicits._
    val unique = Seq((0L, "one two three four"), (1L, "five six seven eight"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicatedSpans(unique, k = 3)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.map(_.getString(3)).toSeq ==
      Seq("one two three four", "five six seven eight"))
  }
}
