package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialize.frontierBeforeSort — the registry-level
  * frontier-before-declared-ORDER-BY (r17 VERDICT item 1). Pins the three
  * semantic claims the optimization rests on:
  *   1. rows AND order AND schema are identical to the raw plan;
  *   2. the rewritten plan sorts over a materialized leaf (the sample
  *      pass cannot re-execute the pipeline) — including when the sort
  *      sits under a trailing projection;
  *   3. scan-shaped children (and the conf kill-switch) are left alone.
  */
class SortFrontierSpec extends SparkSpec {

  // the helper is opt-in (default off — the suite-wide rewrite was
  // measured and rebutted in r18); these tests pin the opted-in behavior
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(Materialize.SortFrontierConf, "true")
  }
  override protected def afterAll(): Unit = {
    spark.conf.unset(Materialize.SortFrontierConf)
    super.afterAll()
  }

  private def events: DataFrame = spark.range(0, 5000)
    .select((col("id") % 97).as("k"), (col("id") * 37 % 1009).as("v"))

  /** The rewritten plan's sort must read the persisted child: its
    * executed plan carries an InMemoryTableScan under the sort, so the
    * range-partitioner sample pass populates the cache and the output
    * pass reads it — the child pipeline executes exactly once.
    */
  private def sortIsOverMaterializedLeaf(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("InMemoryTableScan")

  test("agg + orderBy: identical rows/order, sort child materialized") {
    val raw = events.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k")
    // raw's shape must be read BEFORE the rewrite: the persist registers
    // the child fragment in the CacheManager, after which raw's planner
    // (correctly) picks the cache up too
    assert(!sortIsOverMaterializedLeaf(raw))
    val expected = raw.collect().toSeq
    val opt = Materialize.frontierBeforeSort(raw)
    assert(opt.schema == raw.schema)
    assert(opt.collect().toSeq == expected)
    assert(sortIsOverMaterializedLeaf(opt))
    spark.sharedState.cacheManager.clearCache()
  }

  test("trailing projection over the sort: rebound and identical") {
    // a19-shape: orderBy(...) then select(...) leaves Project over Sort
    val raw = events.groupBy("k").agg(sum("v").as("s"))
      .orderBy(desc("s"), col("k"))
      .select(col("k"), (col("s") * 2).as("s2"))
    val opt = Materialize.frontierBeforeSort(raw)
    assert(opt.schema == raw.schema)
    assert(opt.collect().toSeq == raw.collect().toSeq)
    assert(sortIsOverMaterializedLeaf(opt))
    spark.sharedState.cacheManager.clearCache()
  }

  test("sort-by-expression order keys rebind onto the materialized child") {
    val raw = events.groupBy("k").agg(sum("v").as("s"))
      .orderBy((col("s") % 7).asc, col("k").desc)
    val opt = Materialize.frontierBeforeSort(raw)
    assert(opt.collect().toSeq == raw.collect().toSeq)
    assert(sortIsOverMaterializedLeaf(opt))
    spark.sharedState.cacheManager.clearCache()
  }

  test("scan-shaped child is left untouched") {
    val raw = events.where(col("v") > 500).select("k", "v").orderBy("v", "k")
    val opt = Materialize.frontierBeforeSort(raw)
    // same object-level plan: no frontier job, no LogicalRDD leaf
    assert(opt.queryExecution.analyzed == raw.queryExecution.analyzed)
  }

  test("sorted limit (TakeOrderedAndProject shape) is left untouched") {
    val raw = events.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("k")).limit(5)
    val opt = Materialize.frontierBeforeSort(raw)
    assert(opt.queryExecution.analyzed == raw.queryExecution.analyzed)
  }

  test("default-off: without the opt-in conf the plan is untouched") {
    spark.conf.unset(Materialize.SortFrontierConf)
    try {
      val raw = events.groupBy("k").agg(sum("v").as("s")).orderBy("k")
      val opt = Materialize.frontierBeforeSort(raw)
      assert(opt.queryExecution.analyzed == raw.queryExecution.analyzed)
    } finally spark.conf.set(Materialize.SortFrontierConf, "true")
  }
}
