package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches hand-computed Morton codes") {
    // q0=3 (011), q1=5 (101), 3 bits: bit j of col i at position 2j+i
    // j0: x=1 -> 1<<0, y=1 -> 1<<1; j1: x=1 -> 1<<2; j2: y=1 -> 1<<5
    val df = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 3).as("z"))
    assert(df.as[Long].head() === (1L + 2L + 4L + 32L))
  }

  test("withZValue quantizes by exact integer scaling, constant col -> 0") {
    val df = Seq((0L, 7L), (100L, 7L), (50L, 7L)).toDF("x", "c")
    val got = ZOrder.withZValue(df, Seq("x", "c"), bits = 2)
      .orderBy("x").select("__z").as[Long].collect()
    // x quantized to ((x-0)*3) div 100 -> 0, 1, 3; c constant -> 0;
    // interleave x-only: bits of qx at even positions: 0 -> 0, 1 -> 1, 3 -> 5
    assert(got === Seq(0L, 1L, 5L))
  }

  test("quantization is exact for ranges beyond Long.MaxValue/255 (no wrap)") {
    // range here is ~1.8e18 > Long.MaxValue/255 (~3.6e16): a bigint
    // (x-mn)*255 product would wrap; the DECIMAL(38,0) path must not.
    val lo = Long.MinValue / 2 + 1   // mn < 0: mx-mn also exceeds what a
    val hi = Long.MaxValue / 2       // naive long literal could hold safely
    val mid = 0L
    val df = Seq((lo, 1L), (mid, 1L), (hi, 1L)).toDF("x", "c")
    val got = ZOrder.withZValue(df, Seq("x", "c"), bits = 8)
      .orderBy("x").select("__z").as[Long].collect()
    val range = BigInt(hi) - BigInt(lo)
    def q(x: Long): Long = (((BigInt(x) - BigInt(lo)) * 255) / range).toLong
    def spread(v: Long): Long =   // interleave with constant col: even bits
      (0 until 8).map(j => ((v >> j) & 1L) << (2 * j)).sum
    assert(got === Seq(q(lo), q(mid), q(hi)).map(spread))
    assert(got(1) > 0L && got(2) > got(1), "monotone, not wrapped")
  }

  test("z-curve is total and collision-bounded on a full grid") {
    val grid = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val z = ZOrder.withZValue(grid.toDF("x", "y"), Seq("x", "y"), bits = 4)
      .select("__z").as[Long].collect()
    assert(z.distinct.length === 256, "a full grid must map 1:1 onto the curve")
    assert(z.min === 0L && z.max === 255L)
  }

  test("zorderWrite bounds EVERY dimension's per-file extent (a 1-col sort cannot)") {
    val n = 64
    val grid = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val dir = tmpDir("zorder")

    ZOrder.zorderWrite(df, Seq("x", "y"), dir, bits = 6, numFiles = 8)
    val boxes = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .select("dx", "dy").as[(Long, Long)].collect()
    assert(boxes.length === 8)
    // bounding boxes are tight in BOTH dims on average (a run that
    // crosses a high-bit quadrant boundary can span one dim — that's
    // the curve, not a bug — but never both at once)
    val full = (n - 1).toDouble
    assert(boxes.forall { case (dx, dy) => dx < full || dy < full },
      s"no file may span the full range in both dims: ${boxes.mkString(", ")}")
    val avgDx = boxes.map(_._1).sum.toDouble / boxes.length / full
    val avgDy = boxes.map(_._2).sum.toDouble / boxes.length / full
    assert(avgDx <= 0.65 && avgDy <= 0.65,
      f"avg extents dx=$avgDx%.2f dy=$avgDy%.2f should both be well under full range")

    // contrast: x-sorted strips leave y unbounded (the pruning gap z fixes)
    val stripDir = tmpDir("strips")
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(stripDir)
    val stripDy = spark.read.parquet(stripDir)
      .withColumn("f", input_file_name())
      .groupBy("f").agg((max("y") - min("y")).as("dy"))
      .select("dy").as[Long].collect()
    assert(stripDy.forall(_ === (n - 1).toLong),
      "1-col layout: every file spans the full y range")
  }
}
