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
    assert(v.getAs[Long]("n_distinct") == 2L)
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
}
