package graft.loader

import graft.SparkSpec
import graft.core.{FrameSpec, OhlcvBar}
import graft.storage.ParquetStore
import org.apache.spark.sql.functions._

class LoadOhlcvSpec extends SparkSpec {
  private val m = 60000000000L
  private val t0 = 1640995800000000000L

  test("load_ohlcv: symbol upper-casing, range filter, ordering, timestamp col") {
    val s = spark; import s.implicits._
    val root = tmpDir("loader")
    val store = new ParquetStore(spark, root)
    val bars = (0 until 10).flatMap(i => Seq(
      OhlcvBar("AAPL", t0 + i * m, 100.0 + i, 101.0 + i, 99.0 + i, 100.5 + i, 1000L),
      OhlcvBar("MSFT", t0 + i * m, 200.0 + i, 201.0 + i, 199.0 + i, 200.5 + i, 1000L)))
    store.write(bars.toDF(), FrameSpec.F1m)

    val out = LoadOhlcv(spark, root, Seq("aapl"), "1m",
      startNs = t0 + 2 * m, endNs = t0 + 5 * m)
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("symbol")).distinct.toSeq == Seq("AAPL"))
    assert(rows.map(_.getAs[Long]("ts_ns")).toSeq ==
      Seq(t0 + 2 * m, t0 + 3 * m, t0 + 4 * m), "half-open [start, end), ordered")
    assert(rows.head.getAs[java.sql.Timestamp]("timestamp").getTime == (t0 + 2 * m) / 1000000L)
    intercept[IllegalArgumentException](LoadOhlcv(spark, root, Seq("AAPL"), "7m"))
  }

  test("dateFromPath handles date= prefix, bare dates, and Y/M/D dirs") {
    val s = spark; import s.implicits._
    val df = Seq(
      "/data/raw/frame=1m/symbol=AAPL/date=2024-01-02/job.parquet",
      "/data/legacy/AAPL_2023-05-06.parquet",
      "/data/old/symbol=MSFT/year=2022/month=03/day=09/x.parquet",
      "/data/none/file.parquet"
    ).toDF("path")
    val out = df.select(ParquetStore.dateFromPath(col("path")).as("d"))
      .collect().map(r => Option(r.getAs[java.sql.Date]("d")).map(_.toString))
    assert(out.toSeq == Seq(
      Some("2024-01-02"), Some("2023-05-06"), Some("2022-03-09"), None))
  }

  test("storage stats aggregates file count and bytes") {
    val s = spark; import s.implicits._
    val root = tmpDir("stats")
    val store = new ParquetStore(spark, root)
    store.write(Seq(OhlcvBar("AAPL", t0, 1, 2, 0.5, 1.5, 10L)).toDF(), FrameSpec.F1m)
    val st = store.stats().first()
    assert(st.getAs[Long]("files") >= 1L)
    assert(st.getAs[Long]("total_bytes") > 0L)
  }

  test("trailing patterns: zero-volume runs and volume spikes flagged") {
    val s = spark; import s.implicits._
    val bars = ((0 until 30).map { i =>
      val vol = if (i >= 20 && i < 26) 0L else 100L // 6-run of zero volume
      OhlcvBar("T", t0 + i * m, 10, 11, 9, 10, vol)
    } :+ OhlcvBar("T", t0 + 30 * m, 10, 11, 9, 10, 5000L)).toDF() // 50x spike
    val out = graft.agg.Calculations.withTrailingPatterns(bars)
    val zeroFlagged = out.where(col("suspicious_zero_volume")).count()
    assert(zeroFlagged > 0, "zero-volume run must be flagged")
    val spike = out.where(col("volume_spike")).collect()
    assert(spike.map(_.getAs[Long]("ts_ns")).contains(t0 + 30 * m))
  }
}
