package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankMicro on a 3-path matches hand-computed integer ranks") {
    // 1 - 2 - 3; deg(1)=deg(3)=1, deg(2)=2
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // r0 = 1e6 each
    // i1: r(2) = 150000 + 85*(1e6 + 1e6)/100 = 1850000
    //     r(1) = r(3) = 150000 + 85*(1e6 div 2)/100 = 575000
    // i2: r(2) = 150000 + 85*(575000 + 575000) div 100 = 1127500
    //     r(1) = r(3) = 150000 + (85 * (1850000 div 2)) div 100 = 936250
    val got = GraphRank.pageRankMicro(pairs, iters = 2)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got === Seq((1L, 936250L), (2L, 1127500L), (3L, 936250L)))
  }

  test("duplicate and reversed pairs do not double edges") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val got = GraphRank.pageRankMicro(pairs, iters = 1)
      .orderBy("id").as[(Long, Long)].collect()
    // single undirected edge: both nodes deg 1, contribution 1e6 each
    assert(got === Seq((1L, 1000000L), (2L, 1000000L)))
  }

  test("rank mass is conserved up to integer truncation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    val ranks = GraphRank.pageRankMicro(pairs, iters = 3)
      .agg(sum("rank_micro")).as[Long].head()
    val n = 4L
    // total = n*(0.15*Scale) + 0.85*(previous total) - truncation; stays
    // within n*iters micro-units of n*Scale
    assert(math.abs(ranks - n * GraphRank.Scale) <= n * 3 * 100,
      s"mass $ranks drifted from ${n * GraphRank.Scale}")
  }

  test("rankKeep keeps the most central doc per component, min id on ties") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "solo"),
      (5L, "x"), (6L, "y")).toDF("doc_id", "text")
    // component {1,2,3}: 2 is the hub; component {5,6}: tie -> min id 5
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = GraphRank.rankKeep(docs, pairs, iters = 2)
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(kept === Seq(2L, 4L, 5L))
  }

  test("each iteration is shuffle-bounded: no cartesian, no broadcast of ranks") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = GraphRank.pageRankMicro(pairs, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
