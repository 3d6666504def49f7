package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: same bucket spec on both sides means the
  * equi-join plan has NO Exchange (the write-time shuffle replaces every
  * future read-time shuffle).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two bucketed tables has no shuffle") {
    val s = spark; import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val store = new ParquetStore(spark, tmpDir("unused"))
      val facts = (1 to 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")
      val dims = (1 to 2000).map(i => (i.toLong % 500, s"d$i")).toDF("k", "d")
      store.writeBucketed(facts, "b_facts", "k", 8, sortCol = Some("k"))
      store.writeBucketed(dims, "b_dims", "k", 8, sortCol = Some("k"))
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() == 10000L * 4) // each k matches 4 dim rows
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
