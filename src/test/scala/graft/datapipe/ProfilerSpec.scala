package graft.datapipe

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {

  test("profiles nulls, distincts, bounds, exact means in one pass") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(10), "a"),
      (2L, Some(30), "b"),
      (3L, None, "a")
    ).toDF("id", "v", "tag")
    val p = Profiler.profile(df).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet == Set("id", "v", "tag"))
    val v = p("v")
    assert(v.getAs[Long]("n") == 3L)
    assert(v.getAs[Long]("n_null") == 1L)
    assert(v.getAs[Long]("n_distinct") == 2L) // HLL++ is exact at this cardinality
    assert(v.getAs[String]("min_value") == "10")
    assert(v.getAs[String]("max_value") == "30")
    assert(v.getAs[Double]("mean") == 20.0) // nulls excluded from the mean
    val tag = p("tag")
    assert(tag.getAs[Long]("n_distinct") == 2L)
    assert(tag.isNullAt(tag.fieldIndex("mean")))
    assert(p("id").getAs[String]("dtype") == "bigint")
  }

  test("column subset profiles only the requested columns") {
    val s = spark; import s.implicits._
    val df = Seq((1, "x")).toDF("a", "b")
    val cols = Profiler.profile(df, Seq("a")).collect().map(_.getString(0)).toSeq
    assert(cols == Seq("a"))
  }

  test("default path plans NO Expand; exact opt-in matches on small data") {
    val s = spark; import s.implicits._
    val df = (1 to 500).map(i => (i.toLong, i % 7, s"s${i % 13}", i % 3))
      .toDF("a", "b", "c", "d")
    // multi-countDistinct triggers an Expand that multiplies input rows
    // ~(k+1)x before the exchange; the approx default must not plan one
    def aggPlan(exact: Boolean): String = {
      val targets = Seq("a", "b", "c", "d")
      import org.apache.spark.sql.functions._
      val aggs = targets.map { cn =>
        if (exact) countDistinct(col(cn)).as(s"${cn}__d")
        else approx_count_distinct(col(cn)).as(s"${cn}__d")
      }
      df.agg(aggs.head, aggs.tail: _*)
        .queryExecution.executedPlan.toString
    }
    assert(aggPlan(exact = true).contains("Expand"))   // the blowup exists
    assert(!aggPlan(exact = false).contains("Expand")) // and the default avoids it
    // exact opt-in is exact; the approx default is exact at tiny
    // cardinalities and within HLL++ tolerance at larger ones
    val approx = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val exact = Profiler.profile(df, exactDistinct = true).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(exact == Map("a" -> 500L, "b" -> 7L, "c" -> 13L, "d" -> 3L))
    assert(Seq("b", "c", "d").forall(k => approx(k) == exact(k)))
    assert(math.abs(approx("a") - 500L) <= 50L)
  }
}
