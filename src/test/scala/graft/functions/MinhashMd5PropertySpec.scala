package graft.functions

import graft.SparkSpec
import graft.datapipe.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The fused token-level native signature
  * ([[MinhashMd5]]: one streamed md5 per shingle, k modular
  * double-hash lanes, no shingle strings, no distinct) vs the
  * declarative reference it replaced (explode shingle ARRAYS built with
  * concat_ws + array_distinct, per-shingle `md5()`, hex-decode h1/h2
  * with `conv`, groupBy lane mins) on random corpora — byte-level
  * streaming must equal string-level hashing for every shingle, and
  * min-over-multiset must equal min-over-set. Unicode tokens exercise
  * the UTF8String-vs-String.getBytes boundary; single-shingle and
  * below-n docs exercise the null/absent contract.
  */
class MinhashMd5PropertySpec extends SparkSpec {
  import spark.implicits._

  test("fused token-level signatures equal the declarative shingle-set form") {
    // mixed-width alphabet: ascii, accents, CJK, an emoji (4-byte UTF-8)
    val words = Vector("alpha", "héllo", "日本語", "x", "ému", "🦜", "beta",
      "verylongtokenvalue", "ß")
    val genDocs = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, Gen.choose(1, 15).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(words)).map(_.mkString(" "))))
    } yield docs
    (0 until 6).foreach { seed =>
      val texts = genDocs(Gen.Parameters.default, Seed(seed.toLong)).get
      // duplicate a doc under a colliding id: exercises the lane-wise
      // min-merge across rows of one group
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
        texts.headOption.map(t => (0L, t + " extra tail tokens")).toList
      val docs = rows.toDF("doc_id", "text").repartition(1 + seed % 4)
      val n = 2 + seed % 3
      val k = Seq(1, 4, 16)(seed % 3)

      val fused = Dedup.minhashSignaturesPortable(docs, k = k, n = n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

      val sh = Dedup.shingleArrays(docs, n = n).select(col("doc_id"),
        explode(col("shingles")).as("shingle"))
        .withColumn("hx", md5(col("shingle")))
        .withColumn("h1", conv(substring(col("hx"), 1, 12), 16, 10).cast("long"))
        .withColumn("h2", conv(substring(col("hx"), 13, 12), 16, 10).cast("long"))
      val mins = (0 until k).map(i =>
        min((col("h1") + lit(i.toLong) * col("h2")) %
          lit(MinhashMd5.LaneMod)).as(s"h$i"))
      val declarative = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
        .select(col("doc_id"),
          array((0 until k).map(i => col(s"h$i")): _*).as("signature"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

      assert(fused === declarative,
        s"seed=$seed n=$n k=$k: fused native signatures diverged from the declarative form")
      // docs with < n tokens are absent from BOTH (null contract)
      val tooShort = rows.filter(_._2.split("\\s+").count(_.nonEmpty) < n).map(_._1)
      tooShort.foreach { id =>
        if (!rows.exists(r => r._1 == id && r._2.split("\\s+").count(_.nonEmpty) >= n))
          assert(!fused.contains(id), s"seed=$seed: below-n doc $id must be absent")
      }
    }
  }

  test("token-level streaming is byte-equal to md5 of the joined shingle") {
    // direct single-shingle check incl. multi-byte boundaries
    val toks = Seq("héllo", "日本語", "🦜")
    val viaExpr = Seq(Tuple1(toks)).toDF("t")
      .select(call_function(GraftFunctions.minhashName,
        col("t"), lit(3), lit(1)).as("s"))
      .as[Seq[Long]].head().head
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.mkString(" ").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h1 = 0L
    (0 until 6).foreach(b => h1 = (h1 << 8) | (digest(b) & 0xffL))
    assert(viaExpr == (h1 % MinhashMd5.LaneMod),
      "lane 0 of a single shingle must be h1 mod 2^40 of md5(joined tokens)")
  }
}
