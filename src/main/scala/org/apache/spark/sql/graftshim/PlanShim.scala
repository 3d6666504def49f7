package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Measurement-harness-only plan surgery (Bench / tools, NOT library
  * surface): lives under `org.apache.spark.sql` solely to reach the
  * `private[sql]` `Dataset.ofRows` constructor — the supported way to
  * rebuild a DataFrame from a transformed logical plan.
  *
  * Why it exists (VERDICT r14 item 3): every bench/oracle query ends in
  * a deterministic global ORDER BY, and a global sort EXECUTES ITS CHILD
  * TWICE — once for the range-partitioner's sampling pass, once for the
  * real shuffle — so a bench row pays ~2× its pipeline's cost as
  * measurement tax. These helpers let the harness time (a) the query
  * as-is, (b) the pipeline without the final sort, and (c) the
  * checkpoint-then-sort mitigation, without touching any query or oracle
  * definition.
  */
object PlanShim {

  private def classic(spark: SparkSession): CSparkSession =
    spark.asInstanceOf[CSparkSession]

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(classic(spark), plan)

  /** The frame minus its TOP-LEVEL global Sort, plus whether one was
    * stripped. Only the root node is considered: interior sorts (window
    * orderings, sortWithinPartitions) are semantics, not output order.
    */
  def withoutTopSort(df: DataFrame): (DataFrame, Boolean) =
    df.queryExecution.analyzed match {
      case s: Sort if s.global => (ofRows(df.sparkSession, s.child), true)
      case _ => (df, false)
    }

  /** Checkpoint-then-sort: materialize the pipeline ONCE (localCheckpoint,
    * lineage truncated), then run the global sort over the materialized
    * blocks — the sampling pass re-reads blocks instead of re-executing
    * the pipeline. Output rows/order identical (localCheckpoint preserves
    * output attributes, so the original SortOrder re-binds). Returns the
    * rebuilt frame and a release() for the checkpoint blocks.
    */
  def checkpointedSort(df: DataFrame): (DataFrame, () => Unit) =
    df.queryExecution.analyzed match {
      case s: Sort if s.global =>
        val child = ofRows(df.sparkSession, s.child).localCheckpoint()
        val release: () => Unit = { () =>
          child.queryExecution.analyzed.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }.foreach(_.unpersist(blocking = false))
        }
        (ofRows(df.sparkSession,
          Sort(s.order, global = true, child.queryExecution.analyzed, s.hint)),
          release)
      case _ => (df, () => ())
    }

  /** True when re-executing `p` costs ~one pass over already-stored bytes:
    * a tree of row-local operators (Project/Filter/Union/Limit/alias) over
    * leaves, or a plan whose ROOT is a repartition (the sample pass then
    * re-reads that exchange's shuffle files, which the main pass shares).
    * Anything that puts real computation in the final stage — Aggregate,
    * Window, Join, Generate, Deduplicate, object maps — is NOT cheap: a
    * global sort's range-partitioner sample re-executes exactly that
    * final (post-last-exchange) stage, so those children gain from being
    * materialized once before the sort. Expression cost inside Project /
    * Filter is deliberately ignored: re-evaluating row-local expressions
    * costs ~a second scan, which a frontier (write + 2 reads of output
    * the same scale as the input) cannot beat.
    */
  def cheapToRescan(p: LogicalPlan): Boolean = p match {
    case _: RepartitionOperation => true // root exchange: sample reuses shuffle files
    case _ => rowLocalOverLeaves(p)
  }

  private def rowLocalOverLeaves(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Project(_, c) => rowLocalOverLeaves(c)
    case Filter(_, c) => rowLocalOverLeaves(c)
    case u: Union => u.children.forall(rowLocalOverLeaves)
    case l: LocalLimit => rowLocalOverLeaves(l.child)
    case g: GlobalLimit => rowLocalOverLeaves(g.child)
    case s: SubqueryAlias => rowLocalOverLeaves(s.child)
    case _ => false
  }

  /** Frontier-before-declared-ORDER-BY (r17 VERDICT item 1, the general
    * form of the d17 fix): if the analyzed plan is a global Sort — possibly
    * under a stack of Projects — whose child `shouldFrontier` approves,
    * materialize the child via `materialize` and re-apply the sort (and
    * projects) over the materialized frame, so the range-partitioner's
    * sampling pass reads stored blocks instead of re-executing the final
    * stage of the pipeline. Output rows, order, names and types are
    * identical: the sort/project expressions are re-bound positionally
    * onto the materialized child's output attributes (a localCheckpoint
    * preserves exprIds, making that a no-op; a parquet/persist round-trip
    * re-binds by position).
    */
  def frontierTopSort(df: DataFrame,
                      shouldFrontier: LogicalPlan => Boolean,
                      materialize: DataFrame => DataFrame): DataFrame = {
    val spark = df.sparkSession
    def rebuild(plan: LogicalPlan): Option[(LogicalPlan, Map[ExprId, Attribute])] =
      plan match {
        case p @ Project(exprs, child) =>
          rebuild(child).map { case (c, m) =>
            val newExprs = exprs.map(
              _.transform {
                case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
              }.asInstanceOf[NamedExpression])
            (p.copy(projectList = newExprs, child = c), m)
          }
        case s: Sort if s.global && shouldFrontier(s.child) =>
          val mat = materialize(ofRows(spark, s.child))
          val matPlan = mat.queryExecution.analyzed
          val m: Map[ExprId, Attribute] =
            s.child.output.map(_.exprId).zip(matPlan.output).toMap
          val newOrder = s.order.map(
            _.transform {
              case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
            }.asInstanceOf[SortOrder])
          Some((Sort(newOrder, global = true, matPlan, s.hint), m))
        case _ => None
      }
    rebuild(df.queryExecution.analyzed) match {
      case Some((p, _)) => ofRows(spark, p)
      case None => df
    }
  }
}
