package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}

/** Winnowing fingerprint selection (Schleimer et al. 2003) as one native
  * pass: (grams array<struct<pos int, h long>>, w int) -> the
  * adjacent-deduped rightmost-minimum of every length-`w` sliding window,
  * array<struct<pos int, h long>>.
  *
  * Why a custom expression (SURVEY §2.10 policy): the declarative
  * formulation — per window `slice(grams, s, w)` + `aggregate(...)` fold,
  * then an adjacent-inequality `filter` — is built from higher-order
  * functions, which Spark evaluates INTERPRETED with per-window array and
  * struct allocation: O(grams·w) work carrying an allocation per step.
  * Measured at sf10 (500k docs) as ~300 s task-CPU per execution — and
  * the query's deterministic ORDER BY executes the pipeline twice (range
  * partitioner sampling pass + output pass), so that cost doubles
  * (SCALE.md r14; the same interpreted-HOF class as the r13 m2 unroll).
  * This expression computes the identical selection with a monotonic
  * deque in O(grams): amortized O(1) per window, two primitive scratch
  * arrays, no per-window allocation.
  *
  * Exact-parity contract with the replaced fold (WinnowingSpec pins
  * native ≡ declarative on fixtures and randomized corpora):
  *  - rightmost minimum: the fold took the incoming gram on
  *    `g.h <= acc.h`, so among equal hashes the LATEST wins. The deque
  *    reproduces it by popping the back while `back.h >= incoming.h`
  *    (an equal earlier candidate can never beat a later equal one).
  *  - boundary: fewer than `w` grams = one window over the whole array
  *    (the paper's short-document case, same as `slice`'s truncation).
  *  - adjacent dedup: the rightmost-min POSITION is monotone
  *    non-decreasing as the window slides, so equal consecutive
  *    selections are exactly "same selected index" — emit on change.
  *
  * Preconditions (hold by construction in [[graft.datapipe.Winnowing]]:
  * grams come from a `transform(sequence(...))` over non-null tokens):
  * array elements and their `h` field are non-null. A null element is
  * skipped defensively (treated as +inf, never selected); a null `h`
  * reads as 0 per InternalRow convention.
  */
case class WinnowSelect(left: Expression, right: Expression)
    extends BinaryExpression {

  private def longInput: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(s: StructType, _), IntegerType)
        if s.length == 2 && s(0).dataType == IntegerType && s(1).dataType == LongType =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName window size must be foldable")
    // bare hash array (the native GramHashes output): pos = element index
    case (ArrayType(LongType, _), IntegerType) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName window size must be foldable")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<struct<int, bigint>> or array<bigint>, int), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }

  // struct input: element type (names, nullability) passes through
  // unchanged; long input: the canonical (pos, h) struct is synthesized
  override def dataType: DataType =
    if (longInput)
      ArrayType(new StructType()
        .add("pos", IntegerType, nullable = false)
        .add("h", LongType, nullable = false), containsNull = false)
    else left.dataType
  override def prettyName: String = "graft_winnow_select"

  override protected def nullSafeEval(g: Any, w: Any): Any =
    if (longInput)
      WinnowSelect.selectLongs(g.asInstanceOf[ArrayData], w.asInstanceOf[Int])
    else WinnowSelect.select(g.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (longInput) "selectLongs" else "select"
    nullSafeCodeGen(ctx, ev, (g, w) =>
      s"${ev.value} = graft.functions.WinnowSelect.$method($g, $w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowSelect =
    copy(left = newLeft, right = newRight)
}

object WinnowSelect {
  /** Shared by interpreted eval and generated code. One O(n) pass:
    * hashes and positions unpacked once into primitive arrays, then the
    * standard sliding-window-minimum deque with >= back-pops for the
    * rightmost-tie rule.
    */
  def select(grams: ArrayData, w: Int): ArrayData = {
    val n = grams.numElements()
    if (n == 0 || w <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    val ps = new Array[Int](n)
    val ok = new Array[Boolean](n) // defensive: null elements never selected
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val s = grams.getStruct(i, 2)
        ps(i) = s.getInt(0)
        hs(i) = s.getLong(1)
        ok(i) = true
      }
      i += 1
    }
    // deque of candidate indices, h non-decreasing front to back
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    // deque invariant: only ok indices are ever pushed, h strictly
    // increasing front to back (the >= back-pop enforces it)
    def push(e: Int): Unit = if (ok(e)) {
      while (tail > head && hs(dq(tail - 1)) >= hs(e)) tail -= 1
      dq(tail) = e
      tail += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastSel = -1
    def emit(): Unit = if (tail > head) {
      val sel = dq(head)
      if (sel != lastSel) {
        out += new GenericInternalRow(Array[Any](ps(sel), hs(sel)))
        lastSel = sel
      }
    }
    val firstEnd = math.min(w, n)
    i = 0
    while (i < firstEnd) { push(i); i += 1 }
    emit()
    var s = 1
    val nWindows = math.max(n - w + 1, 1)
    while (s < nWindows) {
      if (tail > head && dq(head) < s) head += 1 // evict left edge
      push(s + w - 1)
      emit()
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The long-array variant (GramHashes input): position IS the element
    * index, hashes are non-null by type. Same deque, same tie rule, same
    * adjacent dedup — only the unpack differs.
    */
  def selectLongs(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0 || w <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = hashes.toLongArray()
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    def push(e: Int): Unit = {
      while (tail > head && hs(dq(tail - 1)) >= hs(e)) tail -= 1
      dq(tail) = e
      tail += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastSel = -1
    def emit(): Unit = {
      val sel = dq(head)
      if (sel != lastSel) {
        out += new GenericInternalRow(Array[Any](sel, hs(sel)))
        lastSel = sel
      }
    }
    val firstEnd = math.min(w, n)
    var i = 0
    while (i < firstEnd) { push(i); i += 1 }
    emit()
    var s = 1
    val nWindows = math.max(n - w + 1, 1)
    while (s < nWindows) {
      if (dq(head) < s) head += 1 // evict left edge
      push(s + w - 1)
      emit()
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Interpreted-eval twin used by specs to cross-check via InternalRow
    * construction helpers.
    */
  def selectRows(pairs: Seq[(Int, Long)], w: Int): Seq[(Int, Long)] = {
    val arr = new GenericArrayData(
      pairs.map { case (p, h) => new GenericInternalRow(Array[Any](p, h)) }.toArray[Any])
    val r = select(arr, w)
    (0 until r.numElements()).map { i =>
      val s = r.getStruct(i, 2).asInstanceOf[InternalRow]
      (s.getInt(0), s.getLong(1))
    }
  }
}
