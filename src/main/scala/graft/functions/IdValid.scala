package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd identifier check-digit validation (CUSIP / ISIN /
  * FIGI) over a raw string column.
  *
  * Why a custom Catalyst expression (SURVEY §2.10 policy: built-ins
  * genuinely fall short): the declarative forms in
  * `graft.symbols.Identifiers` spell the checksum math as higher-order
  * functions — a `transform` to char values, a doubling/digit-sum
  * `transform`, an `aggregate` sum, for ISIN a `flatten`+`reverse` on
  * top — all evaluated through interpreted lambda machinery per row.
  * Validating millions of identifiers made that the hottest row of the
  * sf1 ScdQueries family. This expression runs the whole validation as
  * one primitive char loop inside whole-stage codegen.
  *
  * Semantics are pinned bit-equal to the declarative twins
  * (IdentifiersNativeSpec property-checks random mixed corpora):
  * input is upper(whitespace-strip(raw)) — [[stripWs]] matches the
  * twins' `Identifiers.wstrip` regex class exactly; char values are the
  * CUSIP alphabet (0-9, A-Z→10-35, *→36, @→37, #→38, else invalid);
  * any non-ASCII char makes the string invalid in both formulations,
  * so Java-char iteration and codepoint iteration cannot diverge on
  * the validity verdict. Null in → null out, like the twins.
  */
case class IdValid(kind: Int, child: Expression) extends UnaryExpression {
  require(kind >= IdValid.Cusip && kind <= IdValid.Figi, s"unknown kind $kind")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = IdValid.names(kind)

  override protected def nullSafeEval(s: Any): Any =
    IdValid.valid(kind, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IdValid.valid($kind, $c);")

  override protected def withNewChildInternal(newChild: Expression): IdValid =
    copy(child = newChild)
}

object IdValid {
  val Cusip = 0
  val Isin = 1
  val Figi = 2
  private[functions] val names =
    Array("graft_cusip_valid", "graft_isin_valid", "graft_figi_valid")

  /** ASCII-whitespace strip matching the declarative twins' `wstrip`
    * (Java regex `\s`: space, tab, LF, VT, FF, CR) — reference symbol.py
    * validates `raw.strip()`, so "320193\n" must validate like "320193".
    * UTF8String.trim() strips 0x20 only, which diverged from that.
    */
  private def stripWs(s: String): String = {
    def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var from = 0
    var to = s.length
    while (from < to && ws(s.charAt(from))) from += 1
    while (to > from && ws(s.charAt(to - 1))) to -= 1
    s.substring(from, to)
  }

  /** Entry point shared by interpreted eval and generated code. */
  def valid(kind: Int, raw: UTF8String): Boolean = {
    val s = stripWs(raw.toString).toUpperCase(java.util.Locale.ROOT)
    kind match {
      case Cusip => cusip(s)
      case Isin => isin(s)
      case _ => figi(s)
    }
  }

  /** CUSIP char value; -1 = not a value char. */
  private def cv(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'Z') c - 55
    else if (c == '*') 36
    else if (c == '@') 37
    else if (c == '#') 38
    else -1

  private def digitSum(v: Int): Int = v / 10 + v % 10

  /** 9 value chars; sum over first 8 (double even 1-based positions,
    * digit-sum each); (10 - sum mod 10) mod 10 must equal the 9th.
    */
  private def cusip(s: String): Boolean = {
    if (s.length != 9) return false
    var sum = 0
    var i = 0
    while (i < 8) {
      val v = cv(s.charAt(i))
      if (v < 0) return false
      sum += digitSum(if ((i + 1) % 2 == 0) v * 2 else v)
      i += 1
    }
    val check = cv(s.charAt(8))
    check >= 0 && check <= 9 && (10 - sum % 10) % 10 == check
  }

  /** 2 letters + 9 alnum + check digit; Luhn over the digit expansion
    * (letters→two digits), doubling every second digit from the right,
    * must be divisible by 10. Value chars * @ # are excluded (v > 35
    * invalid), matching the declarative `v > 35` rejection.
    */
  private def isin(s: String): Boolean = {
    if (s.length != 12) return false
    val c0 = s.charAt(0); val c1 = s.charAt(1)
    if (c0 < 'A' || c0 > 'Z' || c1 < 'A' || c1 > 'Z') return false
    // digit expansion, in order
    val digits = new Array[Int](24)
    var nd = 0
    var i = 0
    while (i < 12) {
      val v = cv(s.charAt(i))
      if (v < 0 || v > 35) return false
      if (v >= 10) { digits(nd) = v / 10; digits(nd + 1) = v % 10; nd += 2 }
      else { digits(nd) = v; nd += 1 }
      i += 1
    }
    val check = cv(s.charAt(11))
    if (check < 0 || check > 9) return false
    // Luhn from the right: reversed index r doubles when odd
    var sum = 0
    var r = 0
    while (r < nd) {
      val d = digits(nd - 1 - r)
      sum += (if (r % 2 == 1) digitSum(d * 2) else d)
      r += 1
    }
    sum % 10 == 0
  }

  private def consonantOrDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') ||
      (c >= 'B' && c <= 'Z' && c != 'E' && c != 'I' && c != 'O' && c != 'U')

  /** ^[B-DF-HJ-NP-TV-Z0-9]{2}G[B-DF-HJ-NP-TV-Z0-9]{8}[0-9]$ plus the
    * modified Luhn over the first 11 values (double even 1-based
    * positions, digit-sum) whose (10 - sum mod 10) mod 10 must equal
    * the 12th char.
    */
  private def figi(s: String): Boolean = {
    if (s.length != 12) return false
    if (!consonantOrDigit(s.charAt(0)) || !consonantOrDigit(s.charAt(1))) return false
    if (s.charAt(2) != 'G') return false
    var i = 3
    while (i < 11) {
      if (!consonantOrDigit(s.charAt(i))) return false
      i += 1
    }
    val last = s.charAt(11)
    if (last < '0' || last > '9') return false
    var sum = 0
    i = 0
    while (i < 11) {
      val v = cv(s.charAt(i))
      sum += digitSum(if ((i + 1) % 2 == 0) v * 2 else v)
      i += 1
    }
    (10 - sum % 10) % 10 == last - '0'
  }
}
