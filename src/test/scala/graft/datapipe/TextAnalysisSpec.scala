package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token count and quality ratios") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val q = TextAnalysis.withQuality(df).first()
    assert(q.getAs[Long]("n_tokens") == 6L)
    assert(q.getAs[Long]("n_unique_tokens") == 5L) // 'the' twice
    assert(q.getAs[Double]("stopword_ratio") == 2.0 / 6.0)
    assert(q.getAs[Double]("mean_token_len") == (22 - 5) / 6.0)
  }

  test("langid picks the language with most marker hits") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "le chat et les maisons et des chiens"),
      (4L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "unknown")
  }

  test("bpe-ish token count: letter chunks, digit runs, symbols") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "hello"),        // hell + o -> 2
      (2L, "abcd"),         // one <=4-letter chunk -> 1
      (3L, "a 12345 b!"),   // a, 12345, b, ! -> 4
      (4L, "internationalization") // 20 letters -> 5 chunks of 4
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.tokenCountBpeish(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 2)
    assert(out(2L) == 1)
    assert(out(3L) == 4)
    assert(out(4L) == 5)
  }

  test("PII counts and redaction") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "mail a@b.com and see https://x.io/y or call +14155551234"),
      (2L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withPiiCounts(df)
      .withColumn("red", TextAnalysis.redactPii(col("text")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1L)
    assert(out(1L).getAs[Long]("n_urls") == 1L)
    assert(out(1L).getAs[Long]("n_phones") == 1L)
    assert(out(1L).getAs[String]("red") ==
      "mail <EMAIL> and see <URL> or call <PHONE>")
    assert(out(2L).getAs[Long]("n_emails") == 0L)
    assert(out(2L).getAs[String]("red") == "clean text with no identifiers at all")
  }

  test("repetition ratios flag degenerate documents") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "spam spam spam spam"),           // 1 distinct / 4 -> 0.75
      (2L, "all words here are different"),  // 0.0
      (3L, "a\nb\na\nb")                     // dup lines 0.5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withRepetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_token_ratio"), r.getAs[Double]("dup_line_ratio"))).toMap
    assert(out(1L)._1 == 0.75)
    assert(out(2L)._1 == 0.0)
    assert(out(3L)._2 == 0.5)
  }

  test("dup n-gram ratio: repeated runs flagged, short/unique docs score 0") {
    val s = spark; import s.implicits._
    val d = Seq(
      (1L, "a b c d e a b c d e"),      // 6 5-grams, "a b c d e" twice -> 1/6
      (2L, "one two three four five six"), // all distinct -> 0.0
      (3L, "too short")                  // < 5 tokens -> 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withDupNgramRatio(d, n = 5)
      .select("doc_id", "dup_ngram_ratio")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0 / 6.0) < 1e-12)
    assert(out(2L) == 0.0 && out(3L) == 0.0)
  }

  test("token entropy: uniform max, repeated-token zero, mixed in between") {
    val s = spark; import s.implicits._
    val d = Seq(
      (0L, "a b c d"),   // 4 distinct: ln 4 = 1386294 micro-nats
      (1L, "a a a a"),   // one token: entropy 0
      (2L, "a a b b"))   // ln 4 - ln 2 = ln 2 = 693147
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 1386294L)
    assert(out(1L) == 0L)
    assert(out(2L) == 693147L)
  }

  test("fingerprints are normalization-stable") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "  Hello World  "), (2L, "hello world")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprintMd5(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    val fp64 = df.select(TextAnalysis.fingerprint64(col("text"))).collect().map(_.getLong(0))
    assert(fp64(0) == fp64(1))
  }
}
