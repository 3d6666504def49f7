package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd JL sign-matrix projection: `array<bigint>` vector ->
  * `dims` exact integer coordinates under the portable LCG hyperplanes
  * (`graft.datapipe.Vectors.portablePlaneSign` — sign(p,i) = bit 16 of
  * one LCG step over (p,i)).
  *
  * Why native (the DotProductLong rationale): the higher-order-function
  * formulation runs `dims` interpreted lambda sweeps per vector —
  * measured SLOWER than the codegen'd brute-force dot product it is
  * supposed to beat (SCALE.md sim8). This compiles to one nested
  * primitive loop inside whole-stage codegen; results are bit-identical
  * to the HOF twin and to the DuckDB oracle's integer arithmetic.
  */
case class JlProjectLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, foldable int), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jl_project"

  override protected def nullSafeEval(a: Any, d: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dims = d.asInstanceOf[Int]
    val n = x.numElements()
    val out = new Array[Long](dims)
    var p = 0
    while (p < dims) {
      var acc = 0L
      var i = 0
      while (i < n) {
        val h = (1103515245L * (p.toLong * 65537L + i) + 12345L) % 2147483648L
        val v = x.getLong(i)
        acc += (if (((h >> 16) & 1L) == 0L) v else -v)
        i += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, d) => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$d];
         |for (int $p = 0; $p < $d; $p++) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = (1103515245L * ((long) $p * 65537L + (long) $i) + 12345L) % 2147483648L;
         |    long $v = $a.getLong($i);
         |    $acc += ((($h >> 16) & 1L) == 0L) ? $v : -$v;
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JlProjectLong =
    copy(left = newLeft, right = newRight)
}
