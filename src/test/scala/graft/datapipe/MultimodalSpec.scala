package graft.datapipe

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class MultimodalSpec extends SparkSpec {

  private def media = {
    val s = spark; import s.implicits._
    Multimodal.fromText(
      Seq((1L, "hello world"), (2L, "a" * 200),
        (3L, "émoji start, multi-byte first char")).toDF("doc_id", "text"))
  }

  test("multimodal table has the canonical schema") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "content", "meta"))
    assert(media.schema("content").dataType.typeName == "binary")
  }

  test("decode stub emits deterministic metadata per media row") {
    implicit val s: SparkSession = spark
    val out = Multimodal.decodeStub(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"), r.getAs[Long]("n_bytes"))).toMap
    assert(out(1L) == ((64L + ('h' & 0x3f), 64L + 11 % 64, 11L)))
    assert(out(2L) == ((64L + ('a' & 0x3f), 64L + 200 % 64, 200L)))
  }

  test("decodeBatched (mapPartitions codec path) matches the expression stub") {
    implicit val s: SparkSession = spark
    val a = Multimodal.decodeStub(media).collect().map(_.toString).sorted.toSeq
    val b = Multimodal.decodeBatched(media).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  // real media rows: an actual PNG and JPEG produced by the JDK's own
  // encoder, plus a corrupt payload (text bytes posing as an image)
  private def realMedia = {
    val s = spark; import s.implicits._
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    Seq(
      (10L, "image", png(3, 2, 0xff0000), Map("src" -> "spec")),
      (11L, "image", jpeg(5, 4), Map("src" -> "spec")),
      (12L, "image", "not an image at all".getBytes("UTF-8"), Map("src" -> "spec"))
    ).toDF("media_id", "modality", "content", "meta")
  }

  test("decodeImages: real PNG/JPEG header decode, corrupt rows pass through null") {
    implicit val s: SparkSession = spark
    val out = Multimodal.decodeImages(realMedia).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(10L).getAs[Long]("width") == 3L)
    assert(out(10L).getAs[Long]("height") == 2L)
    assert(out(10L).getAs[String]("format") == "png")
    assert(out(11L).getAs[Long]("width") == 5L)
    assert(out(11L).getAs[Long]("height") == 4L)
    assert(Set("jpeg", "jpg").contains(out(11L).getAs[String]("format")))
    assert(out(12L).isNullAt(out(12L).fieldIndex("width")), "corrupt row -> null dims")
    assert(out(12L).getAs[Long]("n_bytes") == 19L, "corrupt row keeps id + size")
  }

  test("imagePixelStats: exact integer channel sums from a full pixel decode") {
    implicit val s: SparkSession = spark
    val out = Multimodal.imagePixelStats(realMedia).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // 3x2 solid red PNG: 6 pixels of (255, 0, 0), lossless codec
    assert(out(10L).getAs[Long]("sum_r") == 255L * 6)
    assert(out(10L).getAs[Long]("sum_g") == 0L)
    assert(out(10L).getAs[Long]("sum_b") == 0L)
    assert(out(10L).getAs[Long]("width") == 3L && out(10L).getAs[Long]("height") == 2L)
    // solid-black JPEG: lossy, but black encodes to black exactly
    assert(out(11L).getAs[Long]("sum_r") == 0L && out(11L).getAs[Long]("sum_b") == 0L)
    assert(out(12L).isNullAt(out(12L).fieldIndex("width")), "corrupt row -> null stats")
  }

  test("feature stub: fixed-dim deterministic vectors") {
    val rows = Multimodal.featuresStub(media, dim = 4).collect()
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 4))
    val again = Multimodal.featuresStub(media, dim = 4).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("frame sampling keeps every stride-th chunk") {
    val frames = Multimodal.frameSampleStub(media, frameBytes = 50, stride = 2)
      .collect().filter(_.getAs[Long]("media_id") == 2L)
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 2))
  }

  test("size-aware repartition returns all rows") {
    val out = Multimodal.repartitionBySize(media, targetPartitionBytes = 64L)
    assert(out.count() == 3L)
  }
}
