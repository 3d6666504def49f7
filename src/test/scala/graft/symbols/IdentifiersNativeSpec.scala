package graft.symbols

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native codegen'd check-digit expressions (graft.functions.IdValid)
  * must return the identical verdict as the declarative higher-order
  * Identifiers twins on every string — valid identifiers, corrupted
  * check digits, CUSIP specials, lowercase (the upper/trim path),
  * padding, wrong lengths, and arbitrary junk.
  */
class IdentifiersNativeSpec extends SparkSpec {
  graft.functions.GraftFunctions.register(spark)

  private def verdicts(inputs: Seq[String]): Seq[(String, (Boolean, Boolean, Boolean), (Boolean, Boolean, Boolean))] = {
    val s = spark; import s.implicits._
    inputs.toDF("raw")
      .select(col("raw"),
        Identifiers.cusipValid(col("raw")).as("dc"),
        Identifiers.isinValid(col("raw")).as("di"),
        Identifiers.figiValid(col("raw")).as("df"),
        Identifiers.cusipValidNative(col("raw")).as("nc"),
        Identifiers.isinValidNative(col("raw")).as("ni"),
        Identifiers.figiValidNative(col("raw")).as("nf"))
      .collect()
      .map(r => (r.getString(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)),
        (r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toSeq
  }

  test("native equals declarative on known-good and hand-corrupted identifiers") {
    val fixtures = Seq(
      // valid: Apple/Microsoft CUSIP, ISIN, FIGI (public examples)
      "037833100", "594918104", "38259P508",
      "US0378331005", "US5949181045", "GB0002634946",
      "BBG000B9XRY4", "BBG000BPH459",
      // corrupted check digits
      "037833101", "US0378331006", "BBG000B9XRY5",
      // case/trim path
      "  us0378331005 ", "bbg000b9xry4", " 037833100",
      // CUSIP specials and shape traps
      "03783310*", "0378331@0", "03783#100", "", "G", "US037833100",
      "US03783310055", "BBGAAAB9XRY4", "BBG000E9XRY4", "ABG000B9XRY4",
      "BBG000B9XRYX", "0378331000", "ÅS0378331005", "US03783310Ö5",
      // trailing line terminators: trim strips spaces only, and Java's
      // '$' anchor matches before a final '\n' — both twins must reject
      "BBG000B9XRY4\n", "BBG000B9XRY4\r\n", "US0378331005\n",
      "037833100\n", "BBG000B9XRY4\r", "\nBBG000B9XRY4")
    verdicts(fixtures).foreach { case (raw, d, n) =>
      assert(d === n, s"verdict mismatch for '$raw': declarative=$d native=$n")
    }
  }

  test("native equals declarative on random mixed strings") {
    val idChar = Gen.oneOf(
      ('0' to '9') ++ ('A' to 'Z') ++ Seq('*', '@', '#', 'a', 'z', ' ', '!'))
    val genStr = for {
      len <- Gen.choose(0, 14)
      cs <- Gen.listOfN(len, idChar)
    } yield cs.mkString
    val inputs = (0 until 40).flatMap { seed =>
      genStr(Gen.Parameters.default, Seed(seed.toLong)).toList
    } ++
      // near-valid mutations: flip one char of a valid id at every position
      (0 until 9).map(i => "037833100".updated(i, '7')) ++
      (0 until 12).map(i => "US0378331005".updated(i, '3')) ++
      (0 until 12).map(i => "BBG000B9XRY4".updated(i, 'B'))
    verdicts(inputs).foreach { case (raw, d, n) =>
      assert(d === n, s"verdict mismatch for '$raw': declarative=$d native=$n")
    }
  }
}
