package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Per-row nearest-centroid argmax over a packed broadcast centroid
  * array: (q_vec array<bigint>, centroids array<struct<cid bigint,
  * q_cent array<bigint>, cnorm double>>) -> cid of the max-cosine
  * centroid, lowest cid on exact ties.
  *
  * Why a custom expression (SURVEY §2.10 policy): the row-explosion
  * formulation — crossJoin(broadcast(centroids)) to n×k score rows, then
  * groupBy(id).max_by(cid, struct(cosine, -cid)) — puts a STRUCT in the
  * aggregate buffer, which HashAggregate cannot hold, so Catalyst plans
  * SortAggregate: every task sorts its n×k slice. Measured at sf100
  * (2M vectors × 1414 centroids = 2.8e9 intermediate rows): 1129 s wall
  * / 139 GB spilled for a 46 MB result (SCALE.md r13). The argmax is
  * row-local by construction — this expression computes it in one
  * primitive loop inside whole-stage codegen: n rows in, n values out,
  * zero intermediate, zero shuffle.
  *
  * Exact-parity contract with the old formulation (oracle rows pin it):
  * cosine = dot/(sqrt(vSelf)·cnorm) evaluated in the same double steps
  * (cnorm is the precomputed sqrt(cSelf) — identical double product);
  * comparison via java.lang.Double.compare, the same total order
  * (NaN greatest, -0 < 0) Spark's struct max_by ordering used; ascending
  * cid iteration + strict greater-than keeps the LOWEST cid on ties,
  * exactly max_by's (cosine, -cid) rule. Empty centroid array -> -1
  * (callers filter; the old groupBy shape emitted no row at all).
  */
case class NearestCentroidLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // the nested q_cent field matches ArrayType(LongType, _) like the
    // outer arrays: == against ArrayType(LongType) would demand
    // containsNull=true exactly, rejecting the array<bigint> a
    // not-null-preserving transform produces even though eval handles it
    case (ArrayType(LongType, _), ArrayType(s: StructType, _))
        if s.length == 3 && s(0).dataType == LongType &&
          (s(1).dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          }) && s(2).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<struct<bigint, array<bigint>, double>>), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(q: Any, c: Any): Any =
    NearestCentroidLong.nearest(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.NearestCentroidLong.nearest($q, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidLong =
    copy(left = newLeft, right = newRight)
}

/** Per-row nearest-PQ-code argmin over a packed broadcast sub-codebook:
  * (qx array<bigint>, codes array<struct<code bigint, qc array<bigint>,
  * qcself bigint>>) -> code minimizing the integer L2 contrast
  * qcself − 2·(qx·qc), lowest code on ties. Same rationale and same
  * exact-parity contract as [[NearestCentroidLong]] (the old
  * min_by(code, struct(__d, code)) buffer forced SortAggregate over the
  * n·m·ksub row explosion); all-integer arithmetic, so parity is exact
  * by construction. Empty codebook -> -1 (callers filter).
  */
case class NearestCodeLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // see NearestCentroidLong: nested qc field must pattern-match on
    // element type, not == (containsNull must stay free)
    case (ArrayType(LongType, _), ArrayType(s: StructType, _))
        if s.length == 3 && s(0).dataType == LongType &&
          (s(1).dataType match {
            case ArrayType(LongType, _) => true
            case _ => false
          }) && s(2).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<struct<bigint, array<bigint>, bigint>>), " +
        s"got ${l.simpleString} and ${r.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_code"

  override protected def nullSafeEval(q: Any, c: Any): Any =
    NearestCodeLong.nearest(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.NearestCodeLong.nearest($q, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCodeLong =
    copy(left = newLeft, right = newRight)
}

object NearestCodeLong {
  /** Shared by interpreted eval and generated code. Ascending-code
    * iteration + strict less-than keeps the lowest code on exact ties —
    * identical to min_by(code, struct(dist, code)).
    */
  def nearest(qx: ArrayData, codes: ArrayData): Long = {
    val dim = qx.numElements()
    val k = codes.numElements()
    var best = 0L
    var bestCode = -1L
    var found = false
    var c = 0
    while (c < k) {
      val s = codes.getStruct(c, 3)
      val cv = s.getArray(1)
      var dot = 0L
      val n = math.min(dim, cv.numElements())
      var j = 0
      while (j < n) { dot += qx.getLong(j) * cv.getLong(j); j += 1 }
      val d = s.getLong(2) - 2L * dot
      if (!found || d < best) { found = true; best = d; bestCode = s.getLong(0) }
      c += 1
    }
    bestCode
  }
}

object NearestCentroidLong {
  /** Shared by interpreted eval and generated code — one implementation,
    * bit-identical results. Tight primitive loops; the only allocation
    * is the per-centroid struct accessor Spark hands back.
    */
  def nearest(q: ArrayData, cents: ArrayData): Long = {
    val dim = q.numElements()
    var vSelf = 0L
    var i = 0
    while (i < dim) { val x = q.getLong(i); vSelf += x * x; i += 1 }
    val vnorm = math.sqrt(vSelf.toDouble)
    val k = cents.numElements()
    var best = 0.0
    var bestId = -1L
    var found = false
    var c = 0
    while (c < k) {
      val s = cents.getStruct(c, 3)
      val cv = s.getArray(1)
      var dot = 0L
      val n = math.min(dim, cv.numElements())
      var j = 0
      while (j < n) { dot += q.getLong(j) * cv.getLong(j); j += 1 }
      val cos = dot.toDouble / (vnorm * s.getDouble(2))
      if (!found || java.lang.Double.compare(cos, best) > 0) {
        found = true; best = cos; bestId = s.getLong(0)
      }
      c += 1
    }
    bestId
  }
}
