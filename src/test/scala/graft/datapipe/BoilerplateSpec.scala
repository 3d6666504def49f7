package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level dedup: corpus-frequency blocklisting removes repeated
  * boilerplate while preserving unique content and line order;
  * within-doc dedup keeps first occurrences only.
  */
class BoilerplateSpec extends SparkSpec {

  private val footer = "all rights reserved"
  private val banner = "accept our cookies"

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, s"alpha beta gamma\n$footer\ndelta epsilon"),
      (1L, s"$banner\nunique line one\n$footer"),
      (2L, s"unique line two\n$footer\n$banner"),
      (3L, s"$banner\nzeta eta theta"),
      (4L, "iota kappa lambda\nmu nu xi"))
      .toDF("doc_id", "text")
  }

  test("frequentLines finds lines crossing the doc-frequency threshold") {
    val freq = Boilerplate.frequentLines(docs, minDocFreq = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq == Map(footer -> 3L, banner -> 3L))
  }

  test("removeLines strips blocklisted lines, keeps order, counts removals") {
    val out = Boilerplate.stripBoilerplate(docs, minDocFreq = 3L)
      .orderBy("doc_id").collect()
    val byId = out.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(0L) == ((3L, 1L, "alpha beta gamma\ndelta epsilon")))
    assert(byId(1L) == ((3L, 2L, "unique line one")))
    assert(byId(2L) == ((3L, 2L, "unique line two")))
    assert(byId(3L) == ((2L, 1L, "zeta eta theta")))
    assert(byId(4L) == ((2L, 0L, "iota kappa lambda\nmu nu xi")))
  }

  test("removeLines emits an empty-text row when every line is blocklisted") {
    val s = spark; import s.implicits._
    val all = Seq((0L, s"$footer\n$footer"), (1L, footer), (2L, footer))
      .toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(all, minDocFreq = 3L)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getString(3) == ""))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L))
  }

  test("blocklisting is case/whitespace-normalized but text is preserved raw") {
    val s = spark; import s.implicits._
    val d = Seq(
      (0L, "Keep Me\n  ALL RIGHTS RESERVED  "),
      (1L, "all rights reserved\nKeep Me Too"),
      (2L, "All Rights Reserved"))
      .toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplate(d, minDocFreq = 3L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("Keep Me", "Keep Me Too", ""))
  }

  test("plan shape: within-doc dedup is a pure map (zero Exchange)") {
    val df = docs.select(col("doc_id"),
      Boilerplate.dedupLinesInDoc(col("text")).as("text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  test("plan shape: blocklist join finalizes as a broadcast join") {
    val df = Boilerplate.stripBoilerplate(docs, minDocFreq = 3L)
    df.collect() // let AQE finalize (the blocklist is head-of-distribution small)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the frequent-line blocklist broadcast:\n$plan")
  }

  test("dedupLinesInDoc keeps first occurrence, preserves order") {
    val s = spark; import s.implicits._
    val d = Seq(
      (0L, "a b\nc d\na b\ne f\nc d"),
      (1L, "one\ntwo\nthree"),
      (2L, "x\nX \nx")) // normalized repeats of the first raw form
      .toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        Boilerplate.dedupLinesInDoc(col("text")).as("text"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("a b\nc d\ne f", "one\ntwo\nthree", "x"))
  }
}
