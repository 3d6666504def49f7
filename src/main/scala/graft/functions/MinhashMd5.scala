package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native k-lane portable MinHash over a document's shingle array:
  * ONE md5 per shingle + k modular double-hash lanes (the
  * Kirsch–Mitzenhauer family, "Less Hashing, Same Performance") —
  * lane i's value is min over shingles of `(h1 + i*h2) mod 2^40`,
  * where h1/h2 are the first/second 48 bits of md5(shingle) (hex
  * chars 1-12 / 13-24 as unsigned ints).
  *
  * Every intermediate is exact BIGINT on any engine: h1 < 2^48,
  * i*h2 < 15·2^48, sum < 2^53, and the 2^40 reduction is a plain `%`
  * (= bitmask here — operands are nonnegative). The DuckDB oracles
  * recompute identical values from `md5(shingle)` with hex-digit
  * arithmetic (`strpos`-based, the simhash-oracle trick), so
  * cross-engine verification stays bit-exact.
  *
  * Why this scheme (round 10): the previous portable scheme hashed
  * md5(i + "|" + shingle) per LANE — k=16 md5 evaluations per shingle,
  * which profiling showed dominating the three heaviest sf10 rows
  * (pair-graph builder, d3, band-index builder, ~90 s each: ~1.3e9
  * md5 calls). Double hashing needs ONE md5 per shingle; the k lane
  * values are adds+compares.
  *
  * The modular reduction is LOAD-BEARING, not hygiene: without it the
  * lane values are linear in (h1, h2), so each lane's argmin shingle
  * lies on the lower envelope of the doc's (h1, h2) lines — only the
  * few envelope shingles can ever win a lane, lanes become almost
  * perfectly correlated, and a near-dup pair misses ALL bands
  * together (measured: the 0.91-Jaccard fixture pair missed 8/8
  * 2-row bands, a ~1e-6 event under independence). With the mod, each
  * shingle's lane sequence wraps by h2 mod 2^40 per step — per-shingle
  * shifts differ, cross-shingle order re-randomizes per lane, and
  * measured lane agreement ≈ Jaccard with band collision rates at the
  * standard 1−(1−j^r)^b curve. DedupSpec pins the recall fixtures;
  * tie probability between distinct shingles is ~n²/2^41 per lane.
  *
  * Why native: the declarative shape explodes one row per (doc,
  * shingle) and runs the affine mins through an Exchange. This
  * expression computes the whole signature per DOC row — no explode,
  * no aggregation, no shuffle. The declarative twin stays spec-pinned
  * bit-identical (DedupSpec).
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
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
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
  /** Lane-value range: (h1 + i*h2) mod 2^40. */
  val LaneMod: Long = 1L << 40
  private val LaneMask: Long = LaneMod - 1L
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Entry point shared by interpreted eval and generated code. Returns
    * array of k lane minima as longs (null lanes only for an empty
    * shingle array, mirroring the declarative min-over-nothing).
    */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val best = new Array[Long](k)
    java.util.Arrays.fill(best, Long.MaxValue)
    val digest = md.get()
    var j = 0
    while (j < n) {
      digest.reset()
      digest.update(shingles.getUTF8String(j).getBytes)
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
        val v = acc & MinhashMd5.LaneMask // == mod 2^40 (acc nonnegative)
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
