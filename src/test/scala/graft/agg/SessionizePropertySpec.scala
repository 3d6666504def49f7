package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Sessionize vs a naive per-key scan over random event sets — the
  * windowed plan must reproduce the sequential definition (gap rule,
  * tie-breaks, 1-based numbering) at any partitioning.
  */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  private def naive(events: List[(String, Long, Long)], gap: Long): Map[Long, Long] =
    events.groupBy(_._1).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { case (_, t, id) =>
        if (prev == Long.MinValue || t - prev > gap) seq += 1
        prev = t
        id -> seq
      }
    }

  test("sessionize equals the sequential definition on random data") {
    val genEvents = for {
      n <- Gen.choose(0, 80)
      es <- Gen.listOfN(n, for {
        k <- Gen.oneOf("u1", "u2", "u3")
        t <- Gen.choose(0L, 50L) // dense => tie and boundary collisions
      } yield (k, t))
    } yield es.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    (0 until 10).foreach { seed =>
      val events = genEvents(Gen.Parameters.default, Seed(seed.toLong)).get
      val gap = 1L + seed % 5
      val df = events.toDF("user", "t", "id").repartition(1 + seed % 7)
      val got = Sessionize.sessionize(df, Seq("user"), "t", lit(gap), "id")
        .select("id", "session_seq").as[(Long, Long)].collect().toMap
      assert(got === naive(events, gap), s"seed=$seed gap=$gap")
    }
  }
}
