package graft.datapipe

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SpanDedup vs a naive in-memory reference over random small-alphabet
  * corpora (4 symbols force heavy cross-document gram collisions): the
  * covered-set/positional-filter reassembly must reproduce the
  * keep-first-occurrence rule exactly — token counts, removed counts,
  * and the reassembled text — on every seed and k.
  */
class SpanDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential restatement of the operator's contract: gram = k
    * consecutive tokens joined by one space; a gram with >= 2 corpus
    * occurrences keeps its min-(doc_id*PosStride+pos) occurrence and
    * every other occurrence's k positions are removed; survivors
    * reassemble in order.
    */
  private def naive(docs: List[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, text) =>
      id -> text.trim.toLowerCase.split("[ \t\n\r\f]+").toSeq
    }.toMap
    val occ = for {
      (id, t) <- toks.toList
      if t.size >= k
      pos <- 0 to (t.size - k)
    } yield (t.slice(pos, pos + k).mkString(" "), id, pos)
    val byGram = occ.groupBy(_._1).filter(_._2.size >= 2)
    val covered = scala.collection.mutable.Map.empty[Long, Set[Int]].withDefaultValue(Set.empty)
    byGram.values.foreach { os =>
      val keeper = os.minBy { case (_, id, pos) => id * 1000000L + pos }
      os.filterNot(_ == keeper).foreach { case (_, id, pos) =>
        covered(id) = covered(id) ++ (pos until pos + k)
      }
    }
    toks.map { case (id, t) =>
      val kept = t.indices.filterNot(covered(id)).map(t)
      id -> ((t.size.toLong, (t.size - kept.size).toLong, kept.mkString(" ")))
    }
  }

  test("removeDuplicatedSpans equals the naive reference on random corpora") {
    val alphabet = Gen.oneOf("ga", "ta", "ca", "na")
    val genDocs = for {
      n <- Gen.choose(0, 10)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 14)
        ws <- Gen.listOfN(len, alphabet)
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (0 until 8).foreach { seed =>
      val docs = genDocs(Gen.Parameters.default, Seed(seed.toLong)).get
      val k = 2 + seed % 3
      val want = naive(docs, k)
      val got = SpanDedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"), k = k)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === want, s"seed=$seed k=$k docs=$docs")
    }
  }
}
