package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("pairCounts: frequency-weighted adjacent pairs") {
    val s = spark; import s.implicits._
    // "low" x3, "lowest" x1 -> (l,o) 4, (o,w) 4, (w,e) 1, (e,s) 1, (s,t) 1
    val docs = Seq((1L, "low low lowest low")).toDF("doc_id", "text")
    val counts = Bpe.corpusPairCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts == Map(
      ("l", "o") -> 4L, ("o", "w") -> 4L,
      ("w", "e") -> 1L, ("e", "s") -> 1L, ("s", "t") -> 1L))
  }

  test("applyMerge: greedy left-to-right, overlapping runs handled like reference BPE") {
    val s = spark; import s.implicits._
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "a"), Seq("b"))
      .toDF("syms")
    val out = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a"), "aaa merges leftmost pair only")
    assert(out(1) == Seq("a", "b", "aa"))
    assert(out(2) == Seq("b"))
  }

  test("train: classic corpus learns the expected first merges, deterministically") {
    val s = spark; import s.implicits._
    // (l,o) and (o,w) tie at 8 (every low* word has both); subword-nmt's
    // greatest-pair tie-break picks (o,w); then (l,ow) = 8 dominates
    // (e,r) = 7.
    val docs = Seq((1L,
      "low low low low low lower lower lowest newer newer newer wider wider"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 3)
    assert(merges.head == ("o", "w"),
      s"tied round must pick the lexicographically greatest pair: $merges")
    assert(merges(1) == ("l", "ow"), s"second merge chains the first: $merges")
    // deterministic under re-partitioning
    assert(Bpe.train(docs.repartition(5), nMerges = 3) == merges)
  }

  test("encode: trained merges segment unseen text in training order") {
    val s = spark; import s.implicits._
    val merges = Seq(("o", "w"), ("l", "ow"))
    val out = Bpe.encode(Seq((1L, "lowest slow")).toDF("doc_id", "text"), merges)
      .collect().head.getSeq[String](1)
    // lowest: l,o,w,e,s,t -> l,ow,e,s,t -> low,e,s,t; slow: s,l,ow -> s,low
    assert(out == Seq("low", "e", "s", "t", "s", "low"), out.toString)
  }

  test("encodePartitions matches the expression-form encode exactly") {
    val s = spark; import s.implicits._
    val merges = Seq(("t", "a"), ("ta", "b"), ("a", "a"), ("o", "w"), ("l", "ow"))
    val docs = Seq(
      (0L, "table tab aaa aaaa lowest slow"),
      (1L, "x"),
      (2L, "  padded   whitespace\ttabs  "),
      (3L, ""))
      .toDF("doc_id", "text")
    val expr = Bpe.encode(docs, merges).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val imp = Bpe.encodePartitions(docs, merges).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(imp == expr, s"imperative $imp vs expression $expr")
    assert(expr(0L).take(3) == Seq("tab", "l", "e")) // sanity: chains applied
  }

  test("train: stops early when words are exhausted") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one mergeable pair exists; after (a,b) every word is one symbol
    assert(Bpe.train(docs, nMerges = 10) == Seq(("a", "b")))
  }
}
