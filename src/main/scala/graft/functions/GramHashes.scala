package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Per-position k-gram hashes over a token array, in one native codegen
  * pass: (tokens array<string>, k int, seed bigint) -> array<bigint> of
  * length `size(tokens) - k + 1` (empty when the document has fewer than
  * k tokens).
  *
  * Why a custom expression (SURVEY §2.10 policy): every shingling
  * operator in this library — n-gram Jaccard, span dedup, winnowing,
  * duplicated-n-gram repetition — needs "a hash per token k-gram", and
  * the declarative form builds a STRING per gram just to hash it:
  * `transform(sequence(...), i -> xxhash64(array_join(slice(toks,i,k))))`
  * is interpreted higher-order-function evaluation carrying, per gram, a
  * k-element array slice, a joined-string allocation (copying each token
  * k times across overlapping grams), and an interpreted hash call.
  * Measured as the dominant shared constant factor across the shingling
  * bench rows after the winnowing selection fold was made native
  * (VERDICT r14 item 4). This expression hashes each token ONCE
  * (xxhash64 of its UTF8 bytes, seeded) and combines k consecutive token
  * hashes with a degree-k polynomial in the odd constant `MIX` plus a
  * murmur fmix64 finalizer — O(tokens · k) word arithmetic, zero string
  * materialization, inside whole-stage codegen.
  *
  * The hash VALUES differ from `xxhash64(gram-string)` by construction;
  * every consumer uses them only as grouping/join fingerprints where any
  * well-mixed 64-bit function of the gram's token sequence is equivalent
  * (the accepted-collision contract documented at
  * [[graft.datapipe.SpanDedup]]). Order sensitivity comes from the
  * polynomial (non-commutative), so "a b" and "b a" hash differently;
  * token hashing is seeded, so independent hash families (MinHash lanes)
  * can be derived by seed. Null tokens (impossible from `split`, which
  * never yields null elements) hash as the empty string defensively.
  */
case class GramHashes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, LongType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName k and seed must be foldable")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int, bigint), got " +
          s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(toks: Any, k: Any, seed: Any): Any =
    GramHashes.hashes(toks.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, s) =>
      s"${ev.value} = graft.functions.GramHashes.hashes($t, $k, $s);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GramHashes =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GramHashes {
  /** Odd multiplier for the polynomial combine (2^64 / golden ratio). */
  private val Mix = 0x9E3779B97F4A7C15L

  private val Empty = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** murmur3 fmix64 finalizer: the polynomial's low bits are a linear
    * function of the last token's hash; the avalanche decorrelates them
    * so the result is directly usable as a shuffle/bucket key.
    */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Shared by interpreted eval and generated code. */
  def hashes(toks: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = toks.numElements()
    if (k <= 0 || n < k) return Empty
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (toks.isNullAt(i)) XXH64.hashLong(0L, seed)
        else XXH64.hashUTF8String(toks.getUTF8String(i), seed)
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var h = seed
      var j = 0
      while (j < k) { h = h * Mix + th(i + j); j += 1 }
      out(i) = fmix64(h)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Reference twin for specs: same scheme computed from plain strings
    * via the same public XXH64, independent of ArrayData plumbing.
    */
  def reference(tokens: Seq[String], k: Int, seed: Long): Seq[Long] = {
    if (k <= 0 || tokens.size < k) return Seq.empty
    val th = tokens.map(t => XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), seed))
    (0 to tokens.size - k).map { i =>
      var h = seed
      var j = 0
      while (j < k) { h = h * Mix + th(i + j); j += 1 }
      fmix64(h)
    }
  }
}
