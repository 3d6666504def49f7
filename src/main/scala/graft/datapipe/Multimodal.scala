package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * container — `decodeStub` derives deterministic fake dimensions from the
  * bytes). The Spark-side plumbing is real: schema, partition-preserving
  * mapPartitions batch shape (the JVM analogue of `mapInPandas` — one
  * iterator per partition, vectorizable batch inside), and
  * binary-size-aware repartitioning.
  */
object Multimodal {

  /** Canonical multimodal row: id + modality + raw bytes + string meta. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)
  ))

  /** Decoded-image metadata produced by the (stubbed) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)
  ))

  /** Build a multimodal table from any table with an id + string payload
    * (dev stand-in for real media files; content = UTF-8 bytes).
    */
  def fromText(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("modality"),
      col(textCol).cast("binary").as("content"),
      map(lit("source"), lit("synthetic")).as("meta"))

  /** Deterministic fake decode as pure column expressions — the default
    * path stays inside whole-stage codegen (no mapPartitions break).
    * width/height/format derived purely from the byte length and first
    * byte, so results are stable across runs and engines.
    */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val bytes = col("content")
    val firstByte = when(octet_length(bytes) > 0,
      // first payload byte as unsigned int (expression-only, codegen'd)
      ascii(substring(bytes.cast("string"), 1, 1))).otherwise(lit(0))
    media.select(
      col("media_id"),
      (lit(64L) + pmod(firstByte.cast("long"), lit(64L))).as("width"),
      (lit(64L) + pmod(octet_length(bytes).cast("long"), lit(64L))).as("height"),
      lit("fake/rgb8").as("format"),
      octet_length(bytes).cast("long").as("n_bytes"))
  }

  /** The batch-at-a-time codec contract with the deterministic FAKE body
    * (oracle twin of [[decodeStub]] — any engine reproduces its values):
    * mapPartitions gives one iterator per partition (the JVM analogue of
    * `mapInPandas`), so a decode library is initialized once per
    * partition, not once per row. The REAL codecs on this contract are
    * [[decodeImages]] (header-only dims) and [[imagePixelStats]] (full
    * pixel decode) via the JDK's `javax.imageio`.
    */
  def decodeBatched(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    media.select("media_id", "content").mapPartitions { it =>
      // init per-partition codec state here (once, not per row)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // first *character* codepoint of the UTF-8 decode, matching the
        // expression stub's ascii(substring(cast-to-string)) — a raw
        // first-byte read would diverge on multi-byte characters
        val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        val c = if (s.isEmpty) 0 else s.codePointAt(0)
        val w = 64L + (c % 64).toLong
        val h = 64L + (bytes.length % 64).toLong
        Row(id, w, h, "fake/rgb8", bytes.length.toLong)
      }
    }(enc)
  }

  /** Real-decode metadata: width/height nullable — undecodable payloads
    * pass through with their id and size instead of failing the batch
    * (at corpus scale some fraction of scraped media is always corrupt;
    * a throwing decoder would fail whole partitions for one bad row).
    */
  val imageDecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)
  ))

  /** REAL image decode via `javax.imageio` (JDK-built-in: png/jpeg/gif/
    * bmp/wbmp — no external dependency), on the same per-partition batch
    * contract as [[decodeBatched]]. Header-only: the matching
    * `ImageReader` reads width/height/format from the stream header
    * without decoding pixels — the 100 TB shape for metadata extraction
    * (dimension filtering, aspect-ratio screens) where a full pixel
    * decode would be ~100× the IO-adjacent CPU. Undecodable rows emit
    * null dims (see [[imageDecodedSchema]]).
    */
  def decodeImages(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(imageDecodedSchema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val rd = readers.next()
            try {
              rd.setInput(iis, true, true)
              Row(id, rd.getWidth(0).toLong, rd.getHeight(0).toLong,
                rd.getFormatName.toLowerCase(java.util.Locale.ROOT),
                bytes.length.toLong)
            } catch {
              case _: java.io.IOException =>
                Row(id, null, null, null, bytes.length.toLong)
            } finally rd.dispose()
          } else Row(id, null, null, null, bytes.length.toLong)
        } finally if (iis != null) iis.close()
      }
    }(enc)
  }

  /** Full-pixel decode → exact integer channel statistics: width, height,
    * and per-channel value SUMS (longs, not means — integer sums are
    * engine-exact and the mean is one division away). The real-codec
    * stand-in for batch feature extraction: same mapPartitions batch
    * shape an embedding model would use, with the decode library's state
    * initialized per partition, not per row. Undecodable rows emit null
    * stats. Pixel work is per-row CPU with no shuffle — scales linearly
    * with executors; pair with [[repartitionBySize]] so a few giant
    * images cannot straggle a task.
    */
  def imagePixelStats(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.select("media_id", "content").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: java.io.IOException => null }
        if (img == null) Row(id, null, null, null, null, null)
        else {
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Row(id, img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
        }
      }
    }(enc)
  }

  /** Feature extraction (stub): fixed-size float vector per media item,
    * derived deterministically from content bytes — stands in for an
    * image-embedding model batch inference. The formula uses only
    * length/char arithmetic (no engine-specific hash) so results are
    * verifiable bit-for-bit against any SQL engine.
    */
  def featuresStub(media: DataFrame, dim: Int = 8): DataFrame = {
    // dim is known at plan time, so the per-dimension lambda is unrolled
    // into plain column expressions: the original
    // `transform(sequence(0, dim-1), i => ...)` ran the whole formula
    // through the interpreted higher-order-function machinery per row —
    // measured at sf10 (r13 ProfQ) as 47-50 s steady-state for 500k docs
    // where the codegen'd decode stub over the same bytes takes 2.3 s.
    // Unrolled expressions stay inside whole-stage codegen (length/cast
    // subexpressions eliminated once per row, not once per dimension),
    // and element extraction of an array() literal folds, so a consumer
    // selecting two features computes exactly two. Values bit-identical.
    val withBase = media.select(col("media_id"),
      col("content").cast("string").as("__t"),
      octet_length(col("content")).cast("long").as("__nb"))
    val t = col("__t"); val nb = col("__nb")
    val nc = greatest(length(t).cast("long"), lit(1L))
    val feats = (0 until dim).map { i =>
      val pos = (lit(1L) + pmod(lit(i.toLong * 7L), nc)).cast("int")
      val ch = ascii(t.substr(pos, lit(1))).cast("long")
      (pmod(ch * lit(i.toLong + 1L) + nb * 13L + lit(i.toLong * i.toLong),
        lit(1000L)).cast("double") / 1000.0)
    }
    withBase.select(col("media_id"), array(feats: _*).as("features"))
  }

  /** Frame sampling (stub): split the payload into `frameBytes` chunks and
    * keep every `stride`-th chunk — the partition/batch shape of video
    * frame sampling without a codec.
    */
  def frameSampleStub(media: DataFrame, frameBytes: Int = 64, stride: Int = 2): DataFrame =
    media
      .select(col("media_id"),
        posexplode(split(col("content").cast("string"),
          s"(?<=\\G.{$frameBytes})")).as(Seq("frame_no", "frame")))
      .where(pmod(col("frame_no"), lit(stride)) === 0 && length(col("frame")) > 0)

  /** Size-aware repartitioning: media rows are heavily skewed by payload
    * size; repartition by a salted hash of (media_id) with a target
    * partition budget in bytes so one giant video cannot straggle a task.
    */
  def repartitionBySize(media: DataFrame, targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val sized = media.withColumn("_sz", length(col("content")).cast("long"))
    val total = sized.agg(sum("_sz")).first().getLong(0)
    val parts = math.max(1, (total / targetPartitionBytes).toInt + 1)
    sized.repartition(parts, col("media_id")).drop("_sz")
  }
}
