package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PairCovarianceSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000000L

  test("pairCovarianceSums: exact sums over shared hourly buckets, last close wins") {
    val bars = Seq(
      // bucket 0: A has two closes (later 2.0 wins), B has 3.0
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 15L, 3.0),
      // bucket 1: both present
      ("A", H + 1L, 4.0), ("B", H + 2L, 5.0),
      // bucket 2: only A -> excluded by the inner join
      ("A", 2 * H, 9.0)
    ).toDF("symbol", "ts_ns", "close")
      .withColumn("open", col("close")).withColumn("high", col("close"))
      .withColumn("low", col("close")).withColumn("volume", lit(1L))
    val r = Calculations.pairCovarianceSums(bars, "A", "B").head()
    // quantized 1e4: (x,y) pairs = (20000,30000), (40000,50000)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Long]("sum_x") === 60000L)
    assert(r.getAs[Long]("sum_y") === 80000L)
    assert(r.getAs[Long]("sum_xy") === 20000L * 30000L + 40000L * 50000L)
    assert(r.getAs[Long]("sum_xx") === 20000L * 20000L + 40000L * 40000L)
    assert(r.getAs[Long]("sum_yy") === 30000L * 30000L + 50000L * 50000L)
  }

  test("sums are partitioning-invariant (integer accumulation)") {
    val bars = (0 until 500).map { i =>
      val sym = if (i % 2 == 0) "A" else "B"
      (sym, i / 2 * H + i % 7, 100.0 + (i % 13) * 0.37)
    }.toDF("symbol", "ts_ns", "close")
      .withColumn("open", col("close")).withColumn("high", col("close"))
      .withColumn("low", col("close")).withColumn("volume", lit(1L))
    val a = Calculations.pairCovarianceSums(bars, "A", "B").head().toSeq
    val b = Calculations.pairCovarianceSums(bars.repartition(17), "A", "B").head().toSeq
    assert(a === b)
  }
}
