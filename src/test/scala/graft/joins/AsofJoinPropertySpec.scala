package graft.joins

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: AsofJoin vs a brute-force per-key reference across
  * random datasets, directions, tie policies and tolerances — the
  * union+window plan must equal the O(n·m) definition everywhere,
  * including equal-timestamp ties and empty keys.
  */
class AsofJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  import AsofJoinPropertySpec.{L, R}

  private val genData: Gen[(List[L], List[R])] = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    ls <- Gen.listOfN(nl, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 30L) // small range => many exact-tie collisions
    } yield (k, t))
    rs <- Gen.listOfN(nr, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 30L)
    } yield (k, t))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => L(k, t, i.toLong) },
    // v = 1000 + t so the deterministic max-payload tie-break among
    // equal right timestamps is value-visible
    rs.zipWithIndex.map { case ((k, t), i) => R(k, t, 1000L + t * 100L + i) })

  private def bruteForce(ls: List[L], rs: List[R], forward: Boolean,
                         inclusive: Boolean, tol: Option[Long]): Map[Long, Option[Long]] =
    ls.map { l =>
      val eligible = rs.filter(_.k == l.k).filter { r =>
        if (forward) { if (inclusive) r.t >= l.t else r.t > l.t }
        else { if (inclusive) r.t <= l.t else r.t < l.t }
      }
      val best =
        if (eligible.isEmpty) None
        else {
          val bestT =
            if (forward) eligible.map(_.t).min else eligible.map(_.t).max
          // deterministic winner among equal timestamps: max payload
          Some(eligible.filter(_.t == bestT).map(_.v).max)
        }
      val bounded = best.filter { _ =>
        val bt = if (forward) eligible.map(_.t).min else eligible.map(_.t).max
        tol.forall(tl => math.abs(l.t - bt) <= tl)
      }
      l.lid -> bounded
    }.toMap

  test("asofJoin equals the brute-force definition over random data") {
    val cases = for {
      seed <- 0 until 12
      (forward, inclusive, tol) <- Seq(
        (false, true, None), (false, false, None),
        (true, true, None), (true, false, None),
        (false, true, Some(5L)), (true, false, Some(3L)))
    } yield (seed, forward, inclusive, tol)

    cases.foreach { case (seed, forward, inclusive, tol) =>
      val (ls, rs) = genData(Gen.Parameters.default, Seed(seed.toLong)).get
      val left = ls.toDF()
      val right = rs.toDF().withColumnRenamed("v", "rv")
      val got = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
          rightCols = Seq("rv"),
          direction = if (forward) "forward" else "backward",
          allowExactMatches = inclusive,
          tolerance = tol.map(lit(_)))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
      val want = bruteForce(ls, rs, forward, inclusive, tol)
      assert(got === want,
        s"mismatch at seed=$seed forward=$forward inclusive=$inclusive tol=$tol")
    }
  }
}

object AsofJoinPropertySpec {
  final case class L(k: String, t: Long, lid: Long)
  final case class R(k: String, t: Long, v: Long)
}
