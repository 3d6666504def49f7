package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass document text statistics — the integer counts
  * behind every [[graft.datapipe.QualityRules]] metric, computed in one
  * traversal of the document inside whole-stage codegen.
  *
  * Why a custom Catalyst expression (SURVEY §2.10 policy): the
  * declarative metric block runs a half-dozen interpreted higher-order
  * passes per document (token-length `aggregate`, stopword and alpha
  * `filter`s, two `array_distinct`s, a char-class regex sweep) over the
  * same token array — the dominant cost of the quality/classifier/LM
  * family at sf10 (t8 rows 50-89 s, t9 56 s, LM builder 100 s). This
  * expression emits ONLY exact integer counts; every ratio stays the
  * same column-level division it always was, so the derived doubles —
  * and the DuckDB oracles — are bit-identical (TextStatsSpec pins every
  * metric column against the declarative twin, including empty/
  * whitespace-only/unicode edges).
  *
  * Semantics pinned to the twins:
  *   - tokens = split(lower(trim(text)), "[ \t\n\r\f]+") — UTF8String
  *     trim (spaces only) and toUpperCase-free lowering, Java
  *     `Pattern.split(..., -1)`, identical to Spark's `split` (one empty
  *     token for empty input, so n_tokens >= 1 always);
  *   - n_stopword counts tokens in the stopword set (foldable arg,
  *     materialized once);
  *   - n_alpha counts tokens containing any of 'a'..'z' (the `rlike
  *     "[a-z]"` contains-semantics);
  *   - n_symbol counts CODEPOINTS of the RAW text outside
  *     [A-Za-z0-9 \t\n\r\f] and text_len counts all codepoints —
  *     matching `length()` / single-char-class regexp counting;
  *   - n_distinct_tokens / n_lines / n_distinct_lines mirror
  *     `array_distinct` on the token array and on `split(text, "\n")`
  *     of the RAW text.
  *
  * Output struct (all BIGINT): n_tokens, sum_token_len, n_stopword,
  * n_alpha, n_distinct_tokens, text_len, n_symbol, n_lines,
  * n_distinct_lines.
  */
case class TextStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable array<string> stopwords), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "graft_text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i).toString); i += 1 }
    s
  }

  override def nullSafeEval(text: Any, stops: Any): Any =
    TextStats.compute(text.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TextStats.compute($t, $stopsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextStats =
    copy(left = newLeft, right = newRight)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_stopword", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("text_len", LongType, nullable = false),
    StructField("n_symbol", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_distinct_lines", LongType, nullable = false)))

  private val Ws: Pattern = Pattern.compile("[ \t\n\r\f]+")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Entry point shared by interpreted eval and generated code. */
  def compute(raw: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    val rawStr = raw.toString
    // token side: lower(trim(text)) with Spark's space-only trim
    val lowered = raw.trim().toLowerCase().toString
    val toks = Ws.split(lowered, -1)
    var nTokens = 0L
    var sumLen = 0L
    var nStop = 0L
    var nAlpha = 0L
    val seenToks = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      nTokens += 1
      // codepoint length, matching length(tok)
      sumLen += t.codePointCount(0, t.length)
      if (stops.contains(t)) nStop += 1
      var hasAlpha = false
      var j = 0
      while (j < t.length && !hasAlpha) {
        val c = t.charAt(j)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      seenToks.add(t)
      i += 1
    }
    // char side: RAW text codepoints
    var textLen = 0L
    var nSymbol = 0L
    var k = 0
    while (k < rawStr.length) {
      val cp = rawStr.codePointAt(k)
      textLen += 1
      val ok = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9') || (cp <= 0xFFFF && isWs(cp.toChar))
      if (!ok) nSymbol += 1
      k += Character.charCount(cp)
    }
    // line side: RAW text split on \n (limit -1, like Spark's split)
    var nLines = 0L
    val seenLines = new java.util.HashSet[String]()
    var start = 0
    var idx = rawStr.indexOf('\n')
    while (idx >= 0) {
      seenLines.add(rawStr.substring(start, idx))
      nLines += 1
      start = idx + 1
      idx = rawStr.indexOf('\n', start)
    }
    seenLines.add(rawStr.substring(start))
    nLines += 1
    new GenericInternalRow(Array[Any](
      nTokens, sumLen, nStop, nAlpha, seenToks.size.toLong,
      textLen, nSymbol, nLines, seenLines.size.toLong))
  }
}
