package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-lane portable MinHash over a document's shingle array:
  * lane i's value is min over shingles of md5("i|" + shingle), hex
  * lowercase — bit-identical to the declarative
  * `groupBy(doc).agg(min(md5(concat_ws("|", i, shingle))) …)` pipeline
  * and to the DuckDB oracles' `min(md5(concat(i, '|', shingle)))`.
  *
  * Why native: the declarative shape explodes one row per (doc,
  * shingle), evaluates k md5+concat expression trees per exploded row,
  * and runs a k-string-min aggregate (k immutable string buffers per
  * group) through an Exchange. This expression computes the whole
  * signature per DOC row — no explode, no aggregation, no shuffle —
  * and compares candidate digests as raw unsigned bytes, hex-encoding
  * only the k winners (hex order == unsigned byte order, so the minima
  * are identical). The md5 work itself is unchanged and remains the
  * irreducible cost.
  */
case class MinhashMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_md5"

  override protected def nullSafeEval(a: Any, kk: Any): Any =
    MinhashMd5.compute(a.asInstanceOf[ArrayData], kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, d) =>
      s"${ev.value} = graft.functions.MinhashMd5.compute($a, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashMd5 =
    copy(left = newLeft, right = newRight)
}

object MinhashMd5 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Entry point shared by interpreted eval and generated code. Returns
    * array of k hex digests (null lanes only for an empty shingle
    * array, mirroring the declarative min-over-nothing).
    */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val prefixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) {
      prefixes(i) = (i.toString + "|").getBytes(StandardCharsets.UTF_8)
      i += 1
    }
    val best = new Array[Array[Byte]](k)
    val digest = md.get()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j).getBytes
      i = 0
      while (i < k) {
        digest.reset()
        digest.update(prefixes(i))
        digest.update(s)
        val d = digest.digest()
        if (best(i) == null || unsignedLess(d, best(i))) best(i) = d
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) {
      out(i) = if (best(i) == null) null else hex(best(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
