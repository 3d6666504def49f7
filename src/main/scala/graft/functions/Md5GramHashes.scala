package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** The PORTABLE (md5 24-bit-prefix) per-gram hash stream as one native
  * pass: (tokens array<string>, k int) -> array<long> of length
  * `size(tokens) - k + 1`, value at i byte-identical to the declarative
  * `conv(substring(md5(array_join(slice(toks, i+1, k), ' ')), 1, 6), 16, 10)`
  * — i.e. the first 3 md5 digest bytes of the space-joined gram, as an
  * unsigned 24-bit integer.
  *
  * This is the verification-path twin of [[GramHashes]] (same split as
  * [[MinhashMd5]] vs the xxhash64 minhash): the md5-derived values are
  * the cross-engine contract the DuckDB winnowing oracle reproduces, so
  * they cannot change — but HOW they are computed can. The declarative
  * form built a string per gram (interpreted transform + array_join +
  * md5 + hex substring + conv) and dominated the d16/d17 bench rows
  * after everything downstream went native. Here each token's bytes are
  * fetched once and streamed into a thread-local digest per gram with
  * single-space separators (byte-equal to the joined string, the
  * MinhashMd5 technique); no gram string, no hex string, no conv.
  *
  * Null tokens (impossible from `split`) are skipped entirely —
  * neither their bytes nor a separator are emitted — exactly matching
  * `array_join`'s null-skip for every gram shape, not just the
  * all-null edge. Returns empty below k tokens.
  */
case class Md5GramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName k must be foldable")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_gram_hashes"

  override protected def nullSafeEval(toks: Any, k: Any): Any =
    Md5GramHashes.hashes(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.Md5GramHashes.hashes($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5GramHashes =
    copy(left = newLeft, right = newRight)
}

object Md5GramHashes {
  private val Space: Array[Byte] = Array(' '.toByte)
  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code. */
  def hashes(tokens: ArrayData, k: Int): ArrayData = {
    val m = tokens.numElements()
    if (k <= 0 || m < k) return Empty
    val toks = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      // null stays null (not empty bytes): array_join drops null
      // elements AND their separators, so a null token must contribute
      // nothing to the digest — an empty byte string would still emit
      // the space separator and hash differently from the oracle
      toks(t) = if (tokens.isNullAt(t)) null else tokens.getUTF8String(t).getBytes
      t += 1
    }
    val digest = md.get()
    val out = new Array[Long](m - k + 1)
    var i = 0
    while (i <= m - k) {
      digest.reset()
      var w = 0
      var emitted = 0
      while (w < k) {
        val tok = toks(i + w)
        if (tok != null) {
          if (emitted > 0) digest.update(Space)
          digest.update(tok)
          emitted += 1
        }
        w += 1
      }
      val d = digest.digest()
      // first 3 digest bytes big-endian unsigned == hex chars 1-6 of
      // the lowercase hex digest, parsed base-16
      out(i) = ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
