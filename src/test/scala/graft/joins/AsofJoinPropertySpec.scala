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

  private def directed(ls: List[L], rs: List[R], forward: Boolean,
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

  private def bruteForce(ls: List[L], rs: List[R], direction: String,
                         inclusive: Boolean, tol: Option[Long]): Map[Long, Option[Long]] =
    direction match {
      case "forward" => directed(ls, rs, forward = true, inclusive, tol)
      case "backward" => directed(ls, rs, forward = false, inclusive, tol)
      case "nearest" =>
        // closer in-tolerance side wins; distance ties go backward
        // (pandas merge_asof convention)
        val b = directed(ls, rs, forward = false, inclusive, tol)
        val f = directed(ls, rs, forward = true, inclusive, tol)
        def bestT(l: L, forward: Boolean): Option[Long] = {
          val e = rs.filter(_.k == l.k).filter { r =>
            if (forward) { if (inclusive) r.t >= l.t else r.t > l.t }
            else { if (inclusive) r.t <= l.t else r.t < l.t }
          }
          if (e.isEmpty) None
          else Some(if (forward) e.map(_.t).min else e.map(_.t).max)
        }
        ls.map { l =>
          val bv = b(l.lid); val fv = f(l.lid)
          l.lid -> ((bv, fv) match {
            case (Some(_), Some(_)) =>
              val db = l.t - bestT(l, forward = false).get
              val dfw = bestT(l, forward = true).get - l.t
              if (db <= dfw) bv else fv
            case (Some(_), None) => bv
            case (None, x) => x
          })
        }.toMap
    }

  test("asofJoin equals the brute-force definition over random data") {
    val cases = for {
      seed <- 0 until 12
      (direction, inclusive, tol) <- Seq(
        ("backward", true, None), ("backward", false, None),
        ("forward", true, None), ("forward", false, None),
        ("backward", true, Some(5L)), ("forward", false, Some(3L)),
        ("nearest", true, None), ("nearest", false, None),
        ("nearest", true, Some(4L)))
    } yield (seed, direction, inclusive, tol)

    cases.foreach { case (seed, direction, inclusive, tol) =>
      val (ls, rs) = genData(Gen.Parameters.default, Seed(seed.toLong)).get
      val left = ls.toDF()
      val right = rs.toDF().withColumnRenamed("v", "rv")
      val got = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
          rightCols = Seq("rv"),
          direction = direction,
          allowExactMatches = inclusive,
          tolerance = tol.map(lit(_)))
        .select("lid", "rv").as[(Long, Option[Long])].collect().toMap
      val want = bruteForce(ls, rs, direction, inclusive, tol)
      assert(got === want,
        s"mismatch at seed=$seed direction=$direction inclusive=$inclusive tol=$tol")
    }
  }
}

object AsofJoinPropertySpec {
  final case class L(k: String, t: Long, lid: Long)
  final case class R(k: String, t: Long, v: Long)
}
