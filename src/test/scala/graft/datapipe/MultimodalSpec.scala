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
