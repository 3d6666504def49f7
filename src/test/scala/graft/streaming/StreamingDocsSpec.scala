package graft.streaming

import graft.SparkSpec
import graft.datapipe.QualityRules
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming document intake: in-window duplicates collapse (including
  * across micro-batches), the quality ruleset filters the stream exactly
  * as it filters a batch, and the kept rows carry the metric columns.
  */
class StreamingDocsSpec extends SparkSpec {

  final case class Doc(doc_id: Long, text: String, ingest_ts: java.sql.Timestamp)
  private def at(sec: Int) = new java.sql.Timestamp(1704202200000L + sec * 1000L)

  private val clean = "the quick brown fox jumps over a lazy dog and runs " +
    "of to the big field where many other animals play games all day long"
  private val clean2 = "the tall green tree stands near a wide river and many " +
    "of the small birds come to rest there every single warm day in summer"

  test("stream dedups within watermark and applies the quality ruleset") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Doc]
    val out = StreamingDocs.curateStream(mem.toDF())
    val q = out.writeStream.format("memory").queryName("sdc_spec_sink")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("sdc_ckpt")).start()
    try {
      // batch 1: one keeper, one junk (too few tokens), one dup of keeper
      mem.addData(Seq(
        Doc(1L, clean, at(0)),
        Doc(2L, "too short", at(1)),
        Doc(3L, clean, at(2))))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate (same watermark window) + new keeper
      mem.addData(Seq(
        Doc(4L, clean, at(3)),
        Doc(5L, clean2, at(4))))
      q.processAllAvailable()
      val rows = s.sql("SELECT text, n_tokens FROM sdc_spec_sink").collect()
      assert(rows.map(_.getString(0)).toSet == Set(clean, clean2),
        "one survivor per distinct text; junk filtered")
      assert(rows.length == 2, s"duplicates must not land twice: ${rows.length}")
      // metric columns ride along (the annotate map ran on the stream)
      assert(rows.forall(_.getLong(1) >= 20L))
    } finally q.stop()
  }

  test("nearDupStream drops corpus near-dups, keeps novel docs, updates the index via sink") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val corpusText = "the quick brown fox jumps over a lazy dog and runs " +
      "far away to the green hills where the sun sets slowly every evening"
    val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
    // persisted band index, grown by the sink as batches land
    var index = graft.datapipe.Dedup
      .minhashBandsPortable(corpus, k = 16, bands = 4).localCheckpoint()
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val writer = StreamingDocs.nearDupStream(
      mem.toDF().toDF("doc_id", "text"), () => index) { (k, kBands, _) =>
      kept ++= k.select("doc_id").collect().map(_.getLong(0))
      index = index.unionByName(kBands).localCheckpoint()
    }
    val q = writer.option("checkpointLocation", tmpDir("snd_ckpt")).start()
    try {
      // batch 1: a truncated near-copy of the corpus doc + a novel doc
      val novel = "completely different words about sailing boats across " +
        "wide oceans under bright stars with steady winds at night"
      mem.addData(Seq(
        (10L, corpusText.split(" ").dropRight(3).mkString(" ")),
        (11L, novel)))
      q.processAllAvailable()
      assert(kept.toSet == Set(11L),
        s"near-copy must drop, novel doc must survive: $kept")
      // batch 2: a near-copy of batch 1's SURVIVOR — caught only because
      // the sink appended the survivor's bands to the index
      mem.addData(Seq(
        (20L, novel.split(" ").dropRight(2).mkString(" ")),
        (21L, "short doc"))) // < 3 tokens: no band rows, always kept
      q.processAllAvailable()
      assert(kept.toSet == Set(11L, 21L),
        s"survivor near-copy must drop against the grown index: $kept")
    } finally q.stop()
  }
}
