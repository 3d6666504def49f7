package graft.symbols

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Security-identifier validation as pure column expressions (SURVEY §2
  * symbol-domain rows; ref: src/marketpipe/domain/symbol.py:105-233 for
  * the format rules — FIGI/CUSIP/ISIN length+shape, digits-only CIK
  * zero-padded to 10, 4-char MIC, 3-letter currency).
  *
  * On top of the reference's format checks, the standard public check-digit
  * algorithms are enforced (CUSIP mod-10 double-add-double, ISIN Luhn over
  * letter-expanded digits, FIGI's modified Luhn) so a corrupted identifier
  * is caught even when its shape is right. Everything is Spark
  * higher-order-function expressions — codegen'd scans, no UDFs, no
  * shuffle; validation of 10^9 rows is a pure map.
  */
object Identifiers {

  /** Reference-parity whitespace strip (ref symbol.py validates
    * `raw.strip()`, which removes newlines/tabs as well as spaces —
    * Spark's `trim` strips spaces ONLY, so a `trim`-based validator
    * rejected "320193\n" that the reference accepts). ASCII whitespace
    * (Java regex `\s`: space, tab, LF, VT, FF, CR); Python's strip also
    * removes exotic Unicode spaces, a documented residual divergence no
    * identifier feed produces.
    */
  private[graft] def wstrip(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Per-character numeric values: '0'-'9' -> 0-9, 'A'-'Z' -> 10-35,
    * CUSIP specials '*' -> 36, '@' -> 37, '#' -> 38; anything else -> -1.
    * Input must be uppercased. One array element per char.
    *
    * Callers validating at scale should bind this to a column and use the
    * `*ValidFrom` variants: higher-order functions are interpreted, so a
    * validity expression referencing `charValues(expr)` N times evaluates
    * the whole transform N times per row.
    */
  private[graft] def charValues(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => {
      val c = ascii(s.substr(i, lit(1)))
      when(c.between(48, 57), c - 48)
        .when(c.between(65, 90), c - 55)
        .when(c === 42, 36).when(c === 64, 37).when(c === 35, 38)
        .otherwise(-1)
    })

  private def sumL(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x)

  /** digit-sum of a (possibly doubled) value <= 77: tens + ones. */
  private def digitSum(v: Column): Column =
    floor(v / 10).cast("long") + (v % 10)

  /** CUSIP: 9 chars; value chars are alnum + * @ #; check digit = 9th.
    * Sum over first 8 positions (1-based): double even positions, add
    * digit-sum of each; check = (10 - sum mod 10) mod 10.
    */
  def cusipValid(raw: Column): Column = {
    val s = upper(wstrip(raw))
    cusipValidFrom(s, charValues(s))
  }

  /** [[cusipValid]] over pre-bound (uppercased string, charValues) columns
    * — bind both as attributes so the transform runs once per row.
    */
  def cusipValidFrom(s: Column, vals: Column): Column = {
    val body = slice(vals, 1, 8)
    val sum = sumL(transform(body, (v, i) =>
      digitSum(v * when((i + 1) % 2 === 0, 2).otherwise(1))))
    val check = (lit(10L) - (sum % 10L)) % 10L
    (length(s) === 9) &&
      !exists(vals, _ === -1) &&
      element_at(vals, 9).between(0, 9) &&
      (check === element_at(vals, 9).cast("long"))
  }

  /** ISIN: 2 uppercase letters + 9 alnum + 1 check digit; Luhn over the
    * digit expansion of all 12 chars (letters -> two digits) must be
    * divisible by 10, doubling every second digit from the right.
    */
  def isinValid(raw: Column): Column = {
    val s = upper(wstrip(raw))
    isinValidFrom(s, charValues(s))
  }

  /** [[isinValid]] over pre-bound (uppercased string, charValues). */
  def isinValidFrom(s: Column, vals: Column): Column = {
    val digits = flatten(transform(vals, v =>
      when(v >= 10, array(floor(v / 10).cast("long"), (v % 10).cast("long")))
        .otherwise(array(v.cast("long")))))
    val luhn = sumL(transform(reverse(digits), (d, i) =>
      when(i % 2 === 1, digitSum(d * 2)).otherwise(d)))
    (length(s) === 12) &&
      s.substr(lit(1), lit(2)).rlike("^[A-Z]{2}$") &&
      !exists(vals, v => v === -1 || v > 35) &&
      element_at(vals, 12).between(0, 9) &&
      (luhn % 10L === 0L)
  }

  /** FIGI: 12 chars — two consonant/digit chars, 'G', eight
    * consonant/digit chars, one check digit; modified Luhn over the first
    * 11 values (double even positions, digit-sum, mod 10) must yield the
    * 12th char.
    */
  def figiValid(raw: Column): Column = {
    val s = upper(wstrip(raw))
    figiValidFrom(s, charValues(s))
  }

  /** [[figiValid]] over pre-bound (uppercased string, charValues). */
  def figiValidFrom(s: Column, vals: Column): Column = {
    val body = slice(vals, 1, 11)
    val sum = sumL(transform(body, (v, i) =>
      digitSum(v * when((i + 1) % 2 === 0, 2).otherwise(1))))
    val check = (lit(10L) - (sum % 10L)) % 10L
    // explicit length guard alongside the anchored regex: Java's '$'
    // matches BEFORE a final line terminator, so a 13-char string with
    // an INTERIOR-adjacent trailing "\n" surviving wstrip's edge strip
    // cannot exist, but the guard keeps the verdict pinned to the
    // native IdValid.figi twin (which tests s.length != 12) regardless
    (length(s) === 12) &&
      s.rlike("^[B-DF-HJ-NP-TV-Z0-9]{2}G[B-DF-HJ-NP-TV-Z0-9]{8}[0-9]$") &&
      (check === element_at(vals, 12).cast("long"))
  }

  /** Native codegen'd twins ([[graft.functions.IdValid]]): same verdict
    * as [[cusipValid]]/[[isinValid]]/[[figiValid]] (property-pinned in
    * IdentifiersNativeSpec), one primitive char loop in whole-stage
    * codegen instead of interpreted higher-order-function passes — the
    * scale path for validating 10^9 identifiers. The caller must have
    * run `GraftFunctions.register(spark)` on the session.
    */
  def cusipValidNative(raw: Column): Column =
    call_function(graft.functions.GraftFunctions.cusipValidName, raw)

  def isinValidNative(raw: Column): Column =
    call_function(graft.functions.GraftFunctions.isinValidName, raw)

  def figiValidNative(raw: Column): Column =
    call_function(graft.functions.GraftFunctions.figiValidName, raw)

  // \z (absolute end), not $: Java's '$' matches BEFORE a final line
  // terminator, so with a space-only trim "123\n" / "ABCD\n" validated
  // as 3/4-char shapes. wstrip removes edge whitespace first (reference
  // .strip() parity) and \z keeps any INTERIOR terminator invalid.
  // Fixtures in IdentifiersSpec.

  /** CIK: 1-10 digits (stored zero-padded to 10, ref symbol.py:160-173). */
  def cikValid(raw: Column): Column =
    wstrip(raw).rlike("^[0-9]{1,10}\\z")

  /** CIK normalized to the canonical 10-digit zero-padded form. */
  def cikNormalize(raw: Column): Column =
    when(cikValid(raw), lpad(wstrip(raw), 10, "0"))

  /** Exchange MIC: exactly 4 uppercase alphanumeric chars (ISO 10383
    * shape; ref symbol.py:175-184 enforces length 4).
    */
  def micValid(raw: Column): Column =
    upper(wstrip(raw)).rlike("^[A-Z0-9]{4}\\z")

  /** 3-letter ISO currency shape (ref symbol.py:186-195). */
  def currencyValid(raw: Column): Column =
    upper(wstrip(raw)).rlike("^[A-Z]{3}\\z")
}
