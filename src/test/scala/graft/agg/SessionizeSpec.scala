package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, t, id, v) with numeric time; gap = 10
  private def events = Seq(
    ("u1", 0L, 1L, 1.0), ("u1", 5L, 2L, 2.0), ("u1", 16L, 3L, 3.0),
    ("u1", 20L, 4L, 4.0), ("u1", 40L, 5L, 5.0),
    ("u2", 100L, 6L, 6.0)
  ).toDF("user", "t", "id", "v")

  test("session_seq increments on gaps strictly greater than the bound") {
    val tagged = Sessionize.sessionize(events, Seq("user"), "t", lit(10L), "id")
      .orderBy("user", "t")
      .select("id", "session_seq").as[(Long, Long)].collect()
    // u1: 0,5 (gap 5) | 16 (gap 11 > 10 → new) , 20 | 40 (gap 20 → new)
    assert(tagged === Seq(
      (1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L), (6L, 1L)))
  }

  test("__gap_prev is the gap to the previous event, null for the first") {
    val gaps = Sessionize.sessionize(events, Seq("user"), "t", lit(10L), "id")
      .orderBy("user", "t")
      .select("id", "__gap_prev").as[(Long, Option[Long])].collect()
    assert(gaps === Seq(
      (1L, None), (2L, Some(5L)), (3L, Some(11L)), (4L, Some(4L)),
      (5L, Some(20L)), (6L, None)))
  }

  test("a gap exactly equal to the bound stays in-session") {
    val e = Seq(("u", 0L, 1L, 0.0), ("u", 10L, 2L, 0.0)).toDF("user", "t", "id", "v")
    val seqs = Sessionize.sessionize(e, Seq("user"), "t", lit(10L), "id")
      .select("session_seq").as[Long].collect().toSet
    assert(seqs === Set(1L))
  }

  test("sessionSummary aggregates count, bounds and value per session") {
    val out = Sessionize.sessionSummary(events, Seq("user"), "t", lit(10L), "id", "v")
      .orderBy("user", "session_seq")
      .select("user", "session_seq", "n_events", "session_start", "session_end", "sum_value")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(out === Seq(
      ("u1", 1L, 2L, 0L, 5L, 3.0),
      ("u1", 2L, 2L, 16L, 20L, 7.0),
      ("u1", 3L, 1L, 40L, 40L, 5.0),
      ("u2", 1L, 1L, 100L, 100L, 6.0)))
  }

  test("both windows share one sort: exactly one Exchange in the plan") {
    val out = Sessionize.sessionize(events, Seq("user"), "t", lit(10L), "id")
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected a single shuffle:\n$plan")
    assert("Sort ".r.findAllIn(plan).size <= 2, s"windows should share the sort:\n$plan")
  }
}
