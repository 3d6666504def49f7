package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanShim

class PlanShimSpec extends SparkSpec {

  private def df = {
    val s = spark; import s.implicits._
    (1 to 200).map(i => (i.toLong, (i * 37) % 100, s"v$i")).toDF("id", "k", "v")
  }

  test("withoutTopSort strips exactly the root global sort") {
    val sorted = df.groupBy("k").agg(sum("id").as("s")).orderBy("k")
    val (stripped, had) = PlanShim.withoutTopSort(sorted)
    assert(had)
    assert(!stripped.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Sort])
    // same rows, order aside
    assert(stripped.collect().map(_.toSeq).toSet ==
      sorted.collect().map(_.toSeq).toSet)
    // no root sort -> untouched
    val (same, had2) = PlanShim.withoutTopSort(df.where(col("k") > 10))
    assert(!had2 && same.collect().length == df.where(col("k") > 10).count())
    // sortWithinPartitions is NOT a global sort — untouched
    val (swp, had3) = PlanShim.withoutTopSort(df.sortWithinPartitions("k"))
    assert(!had3 && swp.collect().length == 200)
  }

  test("checkpointedSort: identical rows AND order, blocks released") {
    val q = df.repartition(7).groupBy("k").agg(sum("id").as("s")).orderBy(desc("s"), col("k"))
    val want = q.collect().map(_.toSeq).toSeq
    val (ck, release) = PlanShim.checkpointedSort(q)
    try {
      val got = ck.collect().map(_.toSeq).toSeq
      assert(got == want, "checkpointed sort must preserve exact output order")
    } finally release()
  }
}
