package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
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
}
