package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals plain join") {
    val s = spark; import s.implicits._
    val large = (1 to 10000).map(i => (if (i % 10 == 0) "HOT" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("HOT", 1.0), ("k1", 2.0), ("k2", 3.0)).toDF("key", "w")
    val plain = large.join(small, Seq("key")).agg(sum("v"), sum("w")).first()
    val salted = Skew.saltedJoin(large, small, "key", salts = 8)
      .agg(sum("v"), sum("w")).first()
    assert(salted.getLong(0) == plain.getLong(0))
    assert(salted.getDouble(1) == plain.getDouble(1))
  }

  test("salted join is row-equivalent and invariant to input partitioning") {
    val s = spark; import s.implicits._
    val large = (1 to 5000).map(i => (if (i % 10 == 0) "HOT" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("HOT", 1.0), ("k1", 2.0), ("k2", 3.0)).toDF("key", "w")
    val plain = large.join(small, Seq("key"))
    val salted = Skew.saltedJoin(large, small, "key", salts = 8)
    // exact multiset equality, not just aggregates
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the content-hash salt makes routing (and thus the result) stable
    // under re-partitioning — the partition-id salt this replaced was not
    val reparted = Skew.saltedJoin(large.repartition(17), small, "key", salts = 8)
    assert(reparted.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(reparted).count() == 0)
    // left join: unmatched large rows survive exactly once per source row
    val left = Skew.saltedJoin(large, small, "key", salts = 8, joinType = "left")
    assert(left.count() == large.count())
  }

  test("salted aggregation equals plain aggregation") {
    val s = spark; import s.implicits._
    val df = (1 to 10000).map(i => (if (i % 3 == 0) "HOT" else s"k${i % 50}", i.toLong))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(df, "key", salts = 8,
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("paged provider source translates valid records, drops invalid") {
    import graft.sources.PagedProviderSource._
    val pages = Iterator(
      Seq(
        ProviderRecord("aapl", Some(1000L), Some(1.0), Some(2.0), Some(0.5), Some(1.5), Some(10L)),
        ProviderRecord("aapl", None, Some(1.0), Some(2.0), Some(0.5), Some(1.5), Some(10L))),
      Seq(
        ProviderRecord("msft", Some(2000L), Some(3.0), Some(4.0), Some(2.5), Some(3.5), None),
        ProviderRecord("msft", Some(3000L), Some(3.0), Some(4.0), Some(2.5), Some(3.5), Some(7L))))
    val bars = toBars(spark, pages)
    val out = bars.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("AAPL", 1000L), ("MSFT", 3000L)))
    assert(bars.schema == graft.core.Schemas.bars)
  }
}
