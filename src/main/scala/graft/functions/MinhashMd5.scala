package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-lane portable MinHash computed DIRECTLY from a document's
  * token array: for each word n-gram shingle, ONE md5 over the
  * space-joined token bytes (streamed into the digest — the shingle
  * string is never materialized), then k modular double-hash lanes
  * (Kirsch–Mitzenhauer, "Less Hashing, Same Performance") — lane i's
  * value is min over shingles of `(h1 + i*h2) mod 2^40`, where h1/h2
  * are the first/second 48 bits of md5(shingle) (hex chars 1-12 /
  * 13-24 as unsigned ints).
  *
  * Every intermediate is exact BIGINT on any engine: h1 < 2^48,
  * i*h2 < 15·2^48, sum < 2^53, and the 2^40 reduction is a plain `%`
  * (= bitmask here — operands are nonnegative). The DuckDB oracles
  * recompute identical values from `md5(shingle)` with hex-digit
  * arithmetic (`strpos`-based, the simhash-oracle trick), so
  * cross-engine verification stays bit-exact.
  *
  * Two rounds of hot-path surgery live here (round 10):
  *
  * 1. The original portable scheme hashed md5(i + "|" + shingle) per
  *    LANE — k=16 digests per shingle dominated the three heaviest
  *    sf10 rows (~90 s each, ~1.3e9 md5 calls). Double hashing needs
  *    ONE md5 per shingle; the k lane values are adds+compares.
  *    The modular reduction is LOAD-BEARING, not hygiene: without it
  *    the lane values are linear in (h1, h2), each lane's argmin
  *    shingle lies on the lower envelope of the doc's (h1, h2) lines —
  *    only the few envelope shingles can ever win a lane, lanes
  *    correlate almost perfectly, and a near-dup pair misses ALL bands
  *    together (measured: the 0.91-Jaccard fixture pair missed 8/8
  *    2-row bands, a ~1e-6 event under independence). With the mod,
  *    each shingle's lane sequence wraps by h2 mod 2^40 per step —
  *    per-shingle shifts differ, cross-shingle order re-randomizes per
  *    lane, and measured lane agreement ≈ Jaccard with band collisions
  *    on the standard 1−(1−j^r)^b curve.
  * 2. After (1), stage profiling (ProfD3Stages at sf10) showed the
  *    remaining builder cost was ~80% shingle-ARRAY construction:
  *    82M concat_ws strings plus an array_distinct per doc, feeding a
  *    digest that immediately consumed them. A minimum over a multiset
  *    equals the minimum over its distinct set, so signatures need
  *    neither the dedup nor the strings — this expression streams each
  *    shingle's token bytes (with single-space separators, byte-equal
  *    to `md5(concat_ws(" ", …))`) straight into the digest. The
  *    shingle-set operators (exact Jaccard d2/d2b) keep
  *    [[graft.datapipe.Dedup.shingleArrays]], where the set itself IS
  *    the result.
  *
  * Input contract: (tokens array<string>, n foldable int, k foldable
  * int). Returns null when the doc has fewer than n tokens — callers
  * filter `size(tokens) >= n` first, mirroring the declarative
  * `WHERE len(t) >= n`. Tie probability between distinct shingles is
  * ~m²/2^41 per lane; ties only make two engines agree on the same
  * min, never diverge.
  */
case class MinhashMd5(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int n, foldable int k), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_md5"

  override protected def nullSafeEval(toks: Any, nn: Any, kk: Any): Any =
    MinhashMd5.compute(toks.asInstanceOf[ArrayData],
      nn.asInstanceOf[Int], kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, k) => {
      s"""
         |${ev.value} = graft.functions.MinhashMd5.compute($t, $n, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinhashMd5 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinhashMd5 {
  /** Lane-value range: (h1 + i*h2) mod 2^40. */
  val LaneMod: Long = 1L << 40
  private val LaneMask: Long = LaneMod - 1L
  private val Space: Array[Byte] = Array(' '.toByte)
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Entry point shared by interpreted eval and generated code. Returns
    * the k lane minima as longs, or null when fewer than n tokens
    * (mirroring the declarative min-over-nothing: such docs are absent
    * from the grouped result).
    */
  def compute(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return null
    // token bytes fetched once per token, not once per covering shingle
    val toks = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) {
      toks(t) = tokens.getUTF8String(t).getBytes
      t += 1
    }
    val best = new Array[Long](k)
    java.util.Arrays.fill(best, Long.MaxValue)
    val digest = md.get()
    var j = 0
    val last = m - n
    while (j <= last) {
      digest.reset()
      var w = 0
      while (w < n) {
        if (w > 0) digest.update(Space)
        digest.update(toks(j + w))
        w += 1
      }
      val d = digest.digest()
      // h1 = digest bytes 0-5, h2 = bytes 6-11, big-endian unsigned —
      // exactly hex chars 1-12 and 13-24 of the lowercase hex digest
      var h1 = 0L
      var h2 = 0L
      var b = 0
      while (b < 6) {
        h1 = (h1 << 8) | (d(b) & 0xffL)
        h2 = (h2 << 8) | (d(b + 6) & 0xffL)
        b += 1
      }
      var acc = h1 // h1 + i*h2 built incrementally; < 2^53, no overflow
      var i = 0
      while (i < k) {
        val v = acc & LaneMask // == mod 2^40 (acc nonnegative)
        if (v < best(i)) best(i) = v
        acc += h2
        i += 1
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = best(i); i += 1 }
    new GenericArrayData(out)
  }
}
