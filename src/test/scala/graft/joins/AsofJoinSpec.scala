package graft.joins

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, t, lid) — right: (key, t, v)
  private def left = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
    ("b", 15L, 4L), ("c", 5L, 5L)
  ).toDF("k", "t", "lid")

  private def right = Seq(
    ("a", 10L, 100.0), ("a", 25L, 250.0),
    ("b", 15L, 150.0), ("b", 16L, 160.0)
  ).toDF("k", "t", "v")

  test("backward inclusive matches latest right at-or-before") {
    val out = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
        rightCols = Seq("v"), matchedOnAs = Some("mt"))
      .orderBy("lid")
      .select("lid", "v", "mt").as[(Long, Option[Double], Option[Long])]
      .collect()
    assert(out === Seq(
      (1L, Some(100.0), Some(10L)), // equal ts matches (inclusive)
      (2L, Some(100.0), Some(10L)), // 25 is in the future
      (3L, Some(250.0), Some(25L)),
      (4L, Some(150.0), Some(15L)),
      (5L, None, None)))            // key with no right rows
  }

  test("strict excludes the equal-timestamp right row") {
    val out = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
        rightCols = Seq("v"), allowExactMatches = false)
      .orderBy("lid").select("lid", "v").as[(Long, Option[Double])].collect()
    assert(out === Seq(
      (1L, None),         // only right row at t=10 is no longer eligible
      (2L, Some(100.0)),
      (3L, Some(250.0)),
      (4L, None),         // b@15 excluded; b@16 is in the future
      (5L, None)))
  }

  test("forward matches earliest right at-or-after") {
    val out = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
        rightCols = Seq("v"), direction = "forward", matchedOnAs = Some("mt"))
      .orderBy("lid")
      .select("lid", "v", "mt").as[(Long, Option[Double], Option[Long])]
      .collect()
    assert(out === Seq(
      (1L, Some(100.0), Some(10L)),
      (2L, Some(250.0), Some(25L)),
      (3L, None, None),             // nothing after 30
      (4L, Some(150.0), Some(15L)), // inclusive: b@15 itself
      (5L, None, None)))
  }

  test("tolerance nulls out matches farther than the bound") {
    val out = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
        rightCols = Seq("v"), tolerance = Some(lit(5L)))
      .orderBy("lid").select("lid", "v").as[(Long, Option[Double])].collect()
    assert(out === Seq(
      (1L, Some(100.0)), // distance 0
      (2L, None),        // latest-at-or-before is t=10, distance 10 > 5
      (3L, Some(250.0)), // distance 5 (inclusive bound)
      (4L, Some(150.0)),
      (5L, None)))
  }

  test("duplicate right timestamps resolve deterministically (max payload)") {
    val dup = Seq(("a", 10L, 1.0), ("a", 10L, 2.0)).toDF("k", "t", "v")
    val l = Seq(("a", 11L, 1L)).toDF("k", "t", "lid")
    val out = AsofJoin.asofJoin(l, dup, on = "t", by = Seq("k"),
      rightCols = Seq("v")).select("v").as[Double].collect()
    assert(out === Seq(2.0))
  }

  test("left columns are preserved verbatim and collisions are rejected") {
    val out = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
      rightCols = Seq("v"))
    assert(out.columns.toSeq === Seq("k", "t", "lid", "v"))
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right.withColumnRenamed("v", "lid"),
        on = "t", by = Seq("k"), rightCols = Seq("lid"))
    }
  }

  test("adjacent-interval containment equals backward as-of (the r17 j4 rewrite contract)") {
    // versions with: a duplicate valid_from (only the greatest version_key
    // owns a non-empty interval), an open last interval (valid_to null),
    // and probes before the first version (match nothing)
    val versions = Seq(
      ("a", 10L, 1L), ("a", 10L, 2L), ("a", 20L, 3L), // dup valid_from at 10
      ("b", 50L, 4L)
    ).toDF("k", "ts", "version_key")
    val probes = Seq(
      ("a", 5L),  // before first version -> dropped
      ("a", 10L), ("a", 12L), // inside [10,20) -> version 2 (dup winner)
      ("a", 20L), ("a", 99L), // open last interval -> version 3
      ("b", 49L), // before first version -> dropped
      ("b", 50L), ("b", 60L)  // -> version 4
    ).toDF("k", "ts")
    // reference: the explicit interval join (the pre-r17 j4 shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("ts"), col("version_key"))
    val iv = versions
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumnRenamed("ts", "valid_from")
      .withColumnRenamed("k", "vk")
    val expected = probes.join(iv,
        col("k") === col("vk") && col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy("version_key").agg(count(lit(1)).as("n"))
      .orderBy("version_key").as[(Long, Long)].collect()
    val actual = AsofJoin.asofJoin(probes, versions,
        on = "ts", by = Seq("k"), rightCols = Seq("version_key"))
      .where(col("version_key").isNotNull)
      .groupBy("version_key").agg(count(lit(1)).as("n"))
      .orderBy("version_key").as[(Long, Long)].collect()
    assert(actual === expected)
    assert(actual === Seq((2L, 2L), (3L, 2L), (4L, 2L))) // v1's empty interval matches nothing
  }

  test("plan has exactly one Exchange per side and no join operator") {
    val out = AsofJoin.asofJoin(left, right, on = "t", by = Seq("k"),
      rightCols = Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not plan a join operator:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected union-side exchanges only, got $exchanges:\n$plan")
  }
}
