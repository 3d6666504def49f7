package graft.datapipe

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** GraphRank vs a naive in-memory PageRank over random graphs: the
  * distributed join/aggregate plan must reproduce the reference's exact
  * integer ranks on every node, every seed.
  */
class GraphRankPropertySpec extends SparkSpec {
  import spark.implicits._

  private def naive(pairs: List[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    if (edges.isEmpty) return Map.empty
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var r = adj.keys.map(_ -> GraphRank.Scale).toMap
    (1 to iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / adj(src).size }.sum
      }
      r = contrib.map { case (id, s) => id -> (150000L + (85L * s) / 100L) }
    }
    r
  }

  test("pageRankMicro equals the naive reference on random graphs") {
    val genPairs = for {
      n <- Gen.choose(0, 60)
      ps <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L)
      } yield (a, b))
    } yield ps
    (0 until 10).foreach { seed =>
      val pairs = genPairs(Gen.Parameters.default, Seed(seed.toLong)).get
      val iters = 1 + seed % 4
      val got = GraphRank.pageRankMicro(pairs.toDF("id_a", "id_b"), iters = iters)
        .as[(Long, Long)].collect().toMap
      assert(got === naive(pairs, iters), s"seed=$seed iters=$iters")
    }
  }
}
