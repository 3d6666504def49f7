package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.DataType

/** Identity expression deliberately marked NON-deterministic — an
  * optimizer fence for predicates derived from expensive projections.
  *
  * Why it exists: `PushDownPredicates` substitutes project aliases into
  * any deterministic filter condition it pushes (`replaceAlias`), so a
  * filter like `where(size(failed_rules) === 0)` over the
  * QualityRules metric projection is rewritten — alias by alias — into
  * a scan-level predicate containing one copy of the underlying
  * [[TextStats]] call PER METRIC REFERENCE. `FilterExec` performs no
  * subexpression elimination (only project/aggregate do), so the
  * substituted filter re-traverses every document ~9x before the
  * projection ever runs. Measured at sf10: the same annotate lineage
  * runs 3.4 s as a projection, 761.7 s with the filter pushed
  * (tools/ProfLmBuild). Wrapping ONLY the keep-predicate in this
  * barrier makes the condition non-deterministic in the optimizer's
  * eyes, so the filter stays ABOVE the metrics projection and
  * evaluates each metric exactly once — while every other predicate
  * in the plan keeps pushing down as usual.
  *
  * The wrapped value is, of course, perfectly deterministic — the flag
  * is a lie told to exactly one optimizer rule, at the cost of also
  * opting this one predicate out of reorderings that require
  * determinism (all of which would be pessimizations here). Works in
  * batch and streaming plans alike (non-deterministic projections and
  * filters are allowed in append-mode streams).
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pushdown_barrier"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}

object PushdownBarrier {
  /** Column-level helper: `fence(predicate)` keeps `predicate` from
    * being pushed (and alias-substituted) below the projection that
    * defines its inputs. Requires [[GraftFunctions.register]] on the
    * session owning the plan.
    */
  def fence(c: Column): Column =
    call_function(GraftFunctions.pushdownBarrierName, c)
}
