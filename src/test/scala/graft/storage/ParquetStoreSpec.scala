package graft.storage

import graft.SparkSpec
import graft.core.{FrameSpec, OhlcvBar}
import org.apache.spark.sql.functions._

/** Round-trip + keep-last dedup invariants
  * (ref: tests/integration/test_data_roundtrip_e2e.py semantics).
  */
class ParquetStoreSpec extends SparkSpec {
  private val m = 60000000000L
  private val t0 = 1640995800000000000L // 2022-01-01

  private def bars(sym: String, n: Int, base: Double = 100.0) = {
    val s = spark; import s.implicits._
    (0 until n).map(i =>
      OhlcvBar(sym, t0 + i * m, base + i, base + 1 + i, base - 1 + i, base + 0.5 + i, 1000L + i)).toDF()
  }

  test("write/load round-trip preserves values and ns precision") {
    val root = tmpDir("store")
    val store = new ParquetStore(spark, root)
    store.write(bars("AAPL", 10).union(bars("MSFT", 10, 200.0)), FrameSpec.F1m)
    val back = store.load(FrameSpec.F1m)
    assert(back.count() == 20)
    val row = back.where(col("symbol") === "AAPL").orderBy("ts_ns").first()
    assert(row.getAs[Long]("ts_ns") == t0) // exact ns round-trip
    assert(row.getAs[Double]("open") == 100.0)
  }

  test("partition layout is frame=/symbol=/date= and pruning works") {
    val root = tmpDir("store")
    val store = new ParquetStore(spark, root)
    store.write(bars("AAPL", 5), FrameSpec.F1m)
    val dir = new java.io.File(s"$root/frame=1m/symbol=AAPL/date=2022-01-01")
    assert(dir.exists(), s"expected hive layout, got ${dir.getParentFile.getParentFile.list().mkString(",")}")
    val pruned = store.load(FrameSpec.F1m, symbols = Seq("AAPL"))
    assert(pruned.count() == 5)
    assert(store.load(FrameSpec.F1m, symbols = Seq("NOPE")).count() == 0)
  }

  test("compactStore rewrites only crowded partitions down to one file") {
    import org.apache.spark.sql.SaveMode
    val root = tmpDir("compact")
    val store = new ParquetStore(spark, root)
    // AAPL written twice in append mode -> >= 2 files in its partition;
    // MSFT written once compacted -> exactly 1 file, must be left alone
    store.write(bars("AAPL", 10).repartition(2), FrameSpec.F1m, mode = SaveMode.Append)
    store.write(bars("AAPL", 10, 300.0).repartition(2), FrameSpec.F1m, mode = SaveMode.Append)
    store.write(bars("MSFT", 10, 200.0), FrameSpec.F1m,
      mode = SaveMode.Append, compactPartitions = true)
    def filesIn(sym: String) =
      spark.read.option("basePath", root).parquet(root).inputFiles
        .count(_.contains(s"symbol=$sym"))
    assert(filesIn("AAPL") >= 2)
    val msftBefore = filesIn("MSFT")
    val total = spark.read.option("basePath", root).parquet(root).count()
    val n = store.compactStore(maxFilesPerPartition = 1)
    assert(n == 1L, s"expected only AAPL's partition compacted, got $n")
    assert(filesIn("AAPL") == 1)
    assert(filesIn("MSFT") == msftBefore)
    assert(spark.read.option("basePath", root).parquet(root).count() == total,
      "compaction must preserve every row")
  }

  test("appendDedup: incoming wins on (symbol, ts_ns) collisions") {
    val existing = bars("AAPL", 5)
    val incoming = bars("AAPL", 3, base = 500.0) // same ts_ns, new prices
    val merged = ParquetStore.appendDedup(existing, incoming)
    assert(merged.count() == 5)
    val first = merged.orderBy("ts_ns").first()
    assert(first.getAs[Double]("open") == 500.0, "new row must win")
    val last = merged.orderBy(desc("ts_ns")).first()
    assert(last.getAs[Double]("open") == 104.0, "non-colliding existing rows survive")
  }
}
