package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParallelismSpec extends SparkSpec {

  test("widenForCpu widens a narrow input to session shuffle parallelism") {
    val s = spark; import s.implicits._
    val narrow = (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val wide = Parallelism.widenForCpu(narrow)
    assert(wide.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    // row multiset unchanged
    assert(wide.orderBy("id").collect().toSeq ==
      narrow.orderBy("id").collect().toSeq)
  }

  test("widenForCpu never contracts an already-wide input") {
    val s = spark; import s.implicits._
    val target = spark.sessionState.conf.numShufflePartitions
    val wide = (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .repartition(target + 3)
    val out = Parallelism.widenForCpu(wide)
    // identity: no extra exchange inserted, width untouched
    assert(out.rdd.getNumPartitions == target + 3)
    assert(out.queryExecution.executedPlan.toString ==
      wide.queryExecution.executedPlan.toString)
  }

  test("widenForCpu passes a narrow parquet scan through its repartition") {
    val s = spark; import s.implicits._
    val dir = tmpDir("widen_scan")
    (1 to 500).map(i => (i.toLong, s"text body $i"))
      .toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.rdd.getNumPartitions == 1) // the compressed-split cliff
    val counted = Parallelism.widenForCpu(scan)
      .groupBy(length(col("text")).as("len")).count()
    assert(counted.agg(sum("count")).head().getLong(0) == 500L)
  }

  test("widenForCpu is identity for streaming frames") {
    val st = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert(Parallelism.widenForCpu(st) eq st)
  }
}
