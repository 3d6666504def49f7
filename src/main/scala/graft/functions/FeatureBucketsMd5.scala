package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native hashed-n-gram feature buckets for DSIR: from a token array,
  * one bucket id per feature occurrence — non-empty unigrams plus ALL
  * adjacent bigrams (space-joined) — where bucket =
  * (first 3 md5 bytes of "seed|feature") mod nBuckets: exactly
  * `pmod(Sampling.inclusionHash(f, seed), nBuckets)` and the DuckDB
  * oracles' md5/conv arithmetic.
  *
  * Why native (the MinhashMd5 playbook): the declarative shape ran TWO
  * explode legs over the corpus (unigrams, bigram structs), built every
  * feature string through concat expression trees and hashed it through
  * md5+conv+pmod per exploded row. This emits the bucket ids per DOC
  * row in one pass — one explode of small longs downstream instead of
  * two explodes of strings, and the md5 runs over reused byte buffers.
  */
case class FeatureBucketsMd5(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), LongType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable bigint seed, " +
          s"foldable int nBuckets), got ${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_feature_buckets"

  override protected def nullSafeEval(t: Any, s: Any, n: Any): Any =
    FeatureBucketsMd5.compute(t.asInstanceOf[ArrayData],
      s.asInstanceOf[Long], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, n) =>
      s"${ev.value} = graft.functions.FeatureBucketsMd5.compute($t, $s, $n);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FeatureBucketsMd5 =
    copy(first = f, second = s, third = t)
}

object FeatureBucketsMd5 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private def bucketOf(digest: MessageDigest, prefix: Array[Byte],
                       parts: Array[Array[Byte]], nBuckets: Int): Long = {
    digest.reset()
    digest.update(prefix)
    var i = 0
    while (i < parts.length) { digest.update(parts(i)); i += 1 }
    val d = digest.digest()
    // first 6 hex chars == first 3 bytes as an unsigned 24-bit int
    val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
    (v % nBuckets).toLong
  }

  private val space = Array(' '.toByte)

  def compute(tokens: ArrayData, seed: Long, nBuckets: Int): ArrayData = {
    val n = tokens.numElements()
    val prefix = (seed.toString + "|").getBytes(StandardCharsets.UTF_8)
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tokBytes(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    var nonEmpty = 0
    i = 0
    while (i < n) { if (tokBytes(i).length > 0) nonEmpty += 1; i += 1 }
    val nBi = if (n >= 2) n - 1 else 0
    val out = new Array[Long](nonEmpty + nBi)
    val digest = md.get()
    var o = 0
    i = 0
    while (i < n) {
      if (tokBytes(i).length > 0) {
        out(o) = bucketOf(digest, prefix, Array(tokBytes(i)), nBuckets)
        o += 1
      }
      i += 1
    }
    i = 0
    while (i < nBi) {
      out(o) = bucketOf(digest, prefix,
        Array(tokBytes(i), space, tokBytes(i + 1)), nBuckets)
      o += 1
      i += 1
    }
    new GenericArrayData(out)
  }
}
