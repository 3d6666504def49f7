package graft.symbols

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Identifier check-digit validation against publicly known identifiers
  * (Apple/Microsoft/Alphabet CUSIPs, their ISINs, Bloomberg FIGIs) and
  * deliberate corruptions of each.
  */
class IdentifiersSpec extends SparkSpec {

  private def check(vals: Seq[(String, Boolean)],
                    f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val s = spark; import s.implicits._
    val out = vals.map(_._1).toDF("x")
      .select(col("x"), f(col("x")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    vals.foreach { case (v, expected) =>
      assert(out(v) == expected, s"$v expected valid=$expected")
    }
  }

  test("CUSIP check digits") {
    check(Seq(
      "037833100" -> true,   // Apple
      "594918104" -> true,   // Microsoft
      "38259P508" -> true,   // Google (pre-Alphabet)
      "68389X105" -> true,   // Oracle
      "037833101" -> false,  // corrupted check digit
      "037833109" -> false,
      "03783310" -> false,   // 8 chars
      "03783!100" -> false   // bad char
    ), Identifiers.cusipValid)
  }

  test("ISIN Luhn") {
    check(Seq(
      "US0378331005" -> true,  // Apple
      "US5949181045" -> true,  // Microsoft
      "GB0002634946" -> true,  // BAE Systems
      "US0378331004" -> false, // corrupted check digit
      "US037833100" -> false,  // 11 chars
      "0S0378331005" -> false  // country must be letters
    ), Identifiers.isinValid)
  }

  test("FIGI modified Luhn and consonant alphabet") {
    check(Seq(
      "BBG000B9XRY4" -> true,  // Apple
      "BBG000BPH459" -> true,  // Microsoft
      "BBG000B9XRY5" -> false, // corrupted check digit
      "BAG000B9XRY4" -> false, // vowel in position 2
      "BBX000B9XRY4" -> false, // third char must be G
      "BBG000B9XRYZ" -> false  // check position must be a digit
    ), Identifiers.figiValid)
  }

  test("withIdentifierValidity nulls invalid identifiers, keeps flags") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("AAPL", "BBG000B9XRY4", "037833100", "US0378331005", "320193", "XNAS"),
      ("BAD", "BBG000B9XRY5", "037833101", "US0378331004", "32O193", "XN!S")
    ).toDF("ticker", "figi", "cusip", "isin", "cik", "exchange_mic")
    val out = Normalizer.withIdentifierValidity(df).collect()
      .map(r => r.getAs[String]("ticker") -> r).toMap
    val good = out("AAPL"); val bad = out("BAD")
    assert(good.getAs[Boolean]("figi_valid") && good.getAs[String]("figi") == "BBG000B9XRY4")
    assert(good.getAs[String]("cik") == "0000320193") // normalized zero-pad
    assert(!bad.getAs[Boolean]("figi_valid") && bad.getAs[String]("figi") == null)
    assert(!bad.getAs[Boolean]("cusip_valid") && bad.getAs[String]("cusip") == null)
    assert(!bad.getAs[Boolean]("isin_valid") && bad.getAs[String]("isin") == null)
    assert(!bad.getAs[Boolean]("mic_valid"))
    // the staged SymbolRecord schema carries the provider meta map
    assert(graft.core.Schemas.symbolRecord.fields.length == 22)
    assert(graft.core.Schemas.symbolRecord("meta").dataType.typeName == "map")
  }

  test("CIK digits + zero-pad normalization, MIC and currency shapes") {
    check(Seq(
      "320193" -> true, "0000320193" -> true,
      "12345678901" -> false, "32O193" -> false, "" -> false,
      // reference parity (symbol.py validates raw.strip()): edge
      // whitespace — including newlines/tabs, which Spark trim leaves —
      // is stripped before the \z-anchored match, so these validate;
      // INTERIOR whitespace still fails (the \z anchor's job)
      "320193\n" -> true, "320193\r\n" -> true, "\t320193" -> true,
      " 320193 " -> true, "320\n193" -> false
    ), Identifiers.cikValid)
    val s = spark; import s.implicits._
    val n = Seq("320193").toDF("x")
      .select(Identifiers.cikNormalize(col("x"))).first().getString(0)
    assert(n == "0000320193")
    check(Seq("XNAS" -> true, "XNYS" -> true, "ARCX" -> true,
      "XN!S" -> false, "XNASQ" -> false, "XNA" -> false,
      "XNAS\n" -> true, "XN\nAS" -> false), Identifiers.micValid)
    check(Seq("USD" -> true, "EUR" -> true, "US1" -> false, "USDX" -> false,
      "USD\n" -> true, "U\nSD" -> false), Identifiers.currencyValid)
  }
}
