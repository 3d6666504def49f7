package graft.symbols

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizerSpec extends SparkSpec {

  test("scalable surrogate ids equal the global-window ids at any partitioning") {
    val s = spark; import s.implicits._
    val dim = (0 until 500)
      .map(i => (f"KEY$i%04d", s"name_$i"))
      .toDF("natural_key", "payload")
      .orderBy(rand(7)) // shuffle input order: ids depend on key order only
    val window = Normalizer.assignIds(dim).collect()
      .map(r => r.getAs[String]("natural_key") -> r.getAs[Long]("id")).toMap
    for (parts <- Seq(1, 3, 8)) {
      val scalable = Normalizer.assignIdsScalable(dim, numPartitions = parts)
        .collect().map(r => r.getAs[String]("natural_key") -> r.getAs[Long]("id")).toMap
      assert(scalable == window, s"parts=$parts")
    }
    // offset shifts the whole sequence, same as the window variant
    val off = Normalizer.assignIdsScalable(dim, offset = 1000L, numPartitions = 4)
      .agg(min("id"), max("id")).first()
    assert(off.getLong(0) == 1001L && off.getLong(1) == 1500L)
  }

  test("scalable path plans no single-partition global-order window") {
    val s = spark; import s.implicits._
    val dim = (0 until 50).map(i => (s"K$i", i)).toDF("natural_key", "v")
    // the window variant's plan carries a global (empty-partition) Window —
    // the exact shape the scalable path must not have
    val windowPlan = Normalizer.assignIds(dim).queryExecution.executedPlan.toString
    assert(windowPlan.contains("Window"))
    val scalablePlan = Normalizer.assignIdsScalable(dim, numPartitions = 4)
      .queryExecution.executedPlan.toString
    assert(!scalablePlan.contains("Window"))
  }

  test("assignIds auto-promotes to the scalable path above the size threshold") {
    val s = spark; import s.implicits._
    val dim = (0 until 300)
      .map(i => (f"KEY$i%04d", s"name_$i"))
      .toDF("natural_key", "payload")
      .orderBy(rand(11))
    val small = Normalizer.assignIds(dim).collect()
      .map(r => r.getAs[String]("natural_key") -> r.getAs[Long]("id")).toMap
    spark.conf.set(Normalizer.AssignIdsLocalMaxBytesConf, "0")
    try {
      val promoted = Normalizer.assignIds(dim, offset = 0L)
      // no single-partition global-order window anywhere in the plan...
      assert(!promoted.queryExecution.executedPlan.toString.contains("Window"),
        "above threshold assignIds must take the scalable path")
      // ...and ids identical to the window form, dispatch invisible
      val ids = promoted.collect()
        .map(r => r.getAs[String]("natural_key") -> r.getAs[Long]("id")).toMap
      assert(ids == small)
    } finally spark.conf.unset(Normalizer.AssignIdsLocalMaxBytesConf)
  }
}
