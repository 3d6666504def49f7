package graft.datapipe

import graft.core.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-style centrality over an undirected pair graph, in exact
  * integer micro-units — the graph-based quality signal large corpus
  * pipelines use (page-level authority over a link/similarity graph;
  * cf. CCNet/RefinedWeb-style URL quality from web-graph centrality,
  * and "keep the most central duplicate" canonical selection over a
  * near-dup candidate graph, the same graph
  * [[Dedup.duplicateComponents]] contracts).
  *
  * Pregel shape, expressed declaratively: the symmetrized edge list is
  * materialized ONCE with each source's out-degree attached; every power
  * iteration is then one broadcast-free equi-join (ranks onto edges by
  * src) + one (dst)-keyed partial aggregate — two shuffles of (long,
  * long) rows per iteration, nothing text-sized, nothing driver-side.
  * Each iteration's rank table passes through [[Materialize.frontier]]
  * so lineage stays flat (the iterative-operator pattern shared with
  * [[Dedup.duplicateComponentsRounds]] and [[Similarity.ivfTrain]]).
  * At 100 TB this is the standard iterate-over-edges plan: cost is
  * O(E) per round with E partitioned by key, and rounds are a small
  * constant chosen by the caller (quality signals want 2-5 sweeps,
  * not convergence).
  *
  * Arithmetic is engine-exact: ranks live in integer micro-units
  * (1.0 = 1,000,000), each neighbor contribution is `r div outdeg`
  * (integer division), and damping 0.85 is `150000 + (85 * s) div 100`
  * — all order-independent long sums, so a DuckDB oracle reproduces
  * every rank bit-for-bit (no float summation-order hazard). The
  * truncation the integer division introduces is far below any
  * meaningful quality-signal resolution (1e-6 per hop).
  *
  * Symmetrized graphs have no dangling nodes (every node that appears
  * has degree >= 1), so the classic dangling-mass correction is not
  * needed; isolated documents are simply absent and callers treat them
  * as their own canonical (see the g2 keep query).
  */
object GraphRank {

  /** Micro-unit scale: rank 1.0 == 1,000,000. */
  val Scale: Long = 1000000L

  /** Per-node rank after `iters` damped power iterations over the
    * undirected graph given as (aCol, bCol) pairs. Output: (id,
    * rank_micro), one row per node that appears in at least one pair.
    */
  def pageRankMicro(pairs: DataFrame,
                    aCol: String = "id_a", bCol: String = "id_b",
                    iters: Int = 3,
                    scope: Option[graft.core.FrontierScope] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val p0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .where(col("src") =!= col("dst"))
    // symmetrize + out-degree, materialized once: every iteration joins
    // against this same frontier table. Degree via partial aggregate +
    // equi-join, not a per-src window — no per-partition sort, and a
    // skewed hub costs a combiner row, not a sorted run
    val sym = p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val edgesH = Materialize.frontierHandle(
      sym.join(sym.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src")))
    val edges = edgesH.df
    var ranksH: Option[graft.core.Frontier] = None
    var ranks: DataFrame = null
    (1 to iters).foreach { i =>
      // iteration 1's rank table would be the constant Scale for every
      // node (uniform init), so joining it in is an algebraic no-op: the
      // contribution is Scale div deg straight off the degree-annotated
      // edge table. Skipping the join also removes the init rank table's
      // node-set distinct — two shuffles of the edge list gone per call
      // (guide §2.4: remove exchanges the algebra doesn't require). In a
      // symmetrized self-loop-free graph every node appears as a dst, so
      // the iteration-1 output covers exactly the nodes the explicit
      // uniform table covered.
      val contrib =
        if (i == 1) edges.select(col("dst"), expr(s"$Scale div deg").as("c"))
        else edges.join(ranks, edges("src") === ranks("id"))
          .select(col("dst"), expr("r div deg").as("c"))
      val nextH = Materialize.frontierHandle(
        contrib
          .groupBy("dst")
          .agg(sum(col("c")).as("s"))
          .select(col("dst").as("id"),
            expr(s"${(Scale * 15L) / 100L} + (85 * s) div 100").as("r")))
      // iteration i's rank table fed iteration i+1, now materialized —
      // free it so peak storage is one iteration's ranks + the edge table
      ranksH.foreach(_.release())
      ranksH = Some(nextH)
      ranks = nextH.df
    }
    // the last iteration consumed the edge table; only the final rank
    // frontier backs the returned frame
    edgesH.release()
    ranksH.foreach(h => scope.foreach(_.track(h)))
    ranks.select(col("id"), col("r").as("rank_micro"))
  }

  /** Canonical-document selection by centrality: within each connected
    * component of the pair graph keep the highest-ranked doc (ties →
    * lowest id); docs in no pair keep themselves. The centrality-aware
    * upgrade of [[Dedup.componentKeep]]'s min-id rule — at equal
    * dedup semantics, the survivor is the cluster's most-connected
    * member instead of an arbitrary one.
    */
  def rankKeep(docs: DataFrame, pairs: DataFrame,
               iters: Int = 3,
               idCol: String = "doc_id",
               scope: Option[graft.core.FrontierScope] = None): DataFrame = {
    // the pair graph is typically an expensive pipeline (LSH candidates);
    // materialize it ONCE — both the component contraction and the rank
    // iterations ride the same frontier table (skipped when it is
    // already a stored table, which re-scans are as cheap as)
    val pmH = Materialize.frontierHandleIfExpensive(pairs)
    val pm = pmH.df
    val comp = Dedup.duplicateComponents(pm, idCol = idCol, scope = scope)
      .withColumnRenamed(idCol, "__id")
    val rank = pageRankMicro(pm, iters = iters, scope = scope)
    // the returned labels still read pm lazily (through the contraction's
    // lazy node set) — pm's lifetime belongs to the caller's scope, not
    // to this function
    scope.foreach(_.track(pmH))
    // left join: a node present only via self-pairs has a component
    // label but no rank (self-loops carry no mass); rank 0 keeps it
    // eligible without preferring it
    val survivors = comp
      .join(rank, comp("__id") === rank("id"), "left")
      .withColumn("rank_micro", coalesce(col("rank_micro"), lit(0L)))
      .groupBy("cluster_id")
      .agg(max_by(col("__id"), struct(col("rank_micro"), -col("__id"))).as("keep_id"))
      .select(col("keep_id"))
    docs
      .join(comp, docs(idCol) === comp("__id"), "left")
      .join(survivors, docs(idCol) === survivors("keep_id"), "left")
      .where(col("__id").isNull || col("keep_id").isNotNull)
      .select(docs.columns.map(docs(_)): _*)
  }
}
