package graft.storage

import graft.core.FrameSpec
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hive-partitioned Parquet bar store: layout `frame=<f>/symbol=<S>/date=<d>/`.
  *
  * (ref: src/marketpipe/infrastructure/storage/parquet_engine.py:19-95)
  *
  * Spark-first: partition pruning, concurrent-write safety (task commit
  * protocol), and schema-on-read all come from the Parquet source — no
  * user-level file locks or manual directory walks. Writes use zstd and
  * sortWithinPartitions(ts_ns) so Parquet row-group min/max stats make
  * ts_ns range predicates prunable at the row-group level.
  */
final class ParquetStore(spark: SparkSession, root: String) {

  /** Write bars (7-col core + derived frame/date partition cols).
    * Dynamic partition overwrite keeps re-runs idempotent per partition
    * (ref parity: per-job overwrite, parquet_engine.py:100-101).
    */
  /** `compactPartitions`: shuffle rows onto their (frame, symbol, date)
    * target partition before the write, yielding one file per hive
    * partition instead of one per (task x partition). Essential on a big
    * cluster — 1000 tasks x 252 dates would otherwise emit 250k small
    * files — but the extra exchange isn't worth it for single-node jobs,
    * so it's opt-in.
    */
  def write(bars: DataFrame, frame: FrameSpec, mode: SaveMode = SaveMode.Overwrite,
            compactPartitions: Boolean = false): Unit =
    writeFrames(bars.withColumn("frame", lit(frame.name)), mode, compactPartitions)

  /** Write bars that already carry a `frame` column — lets one job write
    * every resampled frame in a single Spark write (one output commit
    * instead of one per frame). Overwrite mode uses *dynamic* partition
    * overwrite, so re-running a job replaces exactly the partitions it
    * produces — the reference's idempotent re-run semantics (T8) — while
    * leaving other frames/symbols/dates untouched.
    */
  def writeFrames(bars: DataFrame, mode: SaveMode = SaveMode.Overwrite,
                  compactPartitions: Boolean = false): Unit = {
    val partitioned = bars
      // `div`, not `/`: double division of ns epochs (> 2^53) can land
      // 1 µs low, which flips the date partition exactly at midnight
      .withColumn("date", to_date(timestamp_micros(expr("ts_ns div 1000"))))
    val placed =
      if (compactPartitions) partitioned.repartition(col("frame"), col("symbol"), col("date"))
      else partitioned
    placed
      .sortWithinPartitions("symbol", "ts_ns")
      .write
      .mode(mode)
      // per-WRITE option, not session conf: a foreachBatch DataFrame
      // belongs to the micro-batch's CLONED session, where a conf set on
      // the outer session is invisible — static overwrite would then wipe
      // every partition under the root on each micro-batch
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy("frame", "symbol", "date")
      .parquet(root)
  }

  /** Append with keep-last dedup on (symbol, ts_ns) — see companion. */
  def appendDedup(existing: DataFrame, incoming: DataFrame): DataFrame =
    ParquetStore.appendDedup(existing, incoming)

  /** Load with partition pruning — replaces the reference's manual
    * directory walks (ref: parquet_engine.py:302-452). All filters are
    * partition-level (frame, symbol, date) or row-group-level (ts_ns).
    */
  def load(
      frame: FrameSpec,
      symbols: Seq[String] = Nil,
      startNs: Option[Long] = None,
      endNs: Option[Long] = None
  ): DataFrame = {
    var df = spark.read.option("basePath", root).parquet(root)
      .where(col("frame") === frame.name)
    if (symbols.nonEmpty) df = df.where(col("symbol").isin(symbols: _*))
    startNs.foreach(s => df = df.where(col("ts_ns") >= s))
    endNs.foreach(e => df = df.where(col("ts_ns") < e))
    df
  }

  /** Bucketed write for co-located joins: both sides of a recurring
    * equi-join written with the same bucket spec join WITHOUT an exchange
    * (SortMergeJoin reads bucket-aligned files directly). The 100 TB tool
    * for fact-fact joins that recur on the same key — pay the shuffle once
    * at write time, never at read time.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Small-file compaction: rewrite exactly the (frame, symbol, date)
    * partitions that have accumulated more than `maxFilesPerPartition`
    * data files (append-mode ingest, retries and task-parallel writes all
    * create slivers). Partition selection is a pure file-index query; the
    * rewrite reads ONLY the affected partitions (partition-pruned scan)
    * and replaces them via dynamic overwrite — untouched partitions are
    * never read or written. Returns the number of partitions compacted.
    */
  def compactStore(maxFilesPerPartition: Int = 1): Long = {
    val files = spark.read.option("basePath", root).parquet(root).inputFiles
    val crowded = files
      .map(new org.apache.hadoop.fs.Path(_).getParent.toString)
      .groupBy(identity).filter(_._2.length > maxFilesPerPartition)
      .keys.toSeq
    if (crowded.isEmpty) return 0L
    def part(dir: String, key: String): String = {
      val m = s"$key=([^/]+)".r.findFirstMatchIn(dir)
      m.map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"unpartitioned dir in store: $dir"))
    }
    val keys = crowded.map(d => (part(d, "frame"), part(d, "symbol"), part(d, "date")))
    import spark.implicits._
    val keyDf = keys.toDF("frame", "symbol", "date")
      .withColumn("date", to_date(col("date")))
    val affected = spark.read.option("basePath", root).parquet(root)
      .join(broadcast(keyDf), Seq("frame", "symbol", "date"), "left_semi")
    // materialize BEFORE the overwrite of the same partitions (cannot
    // stream from files being replaced; lineage recompute would read them
    // too). Materialize.frontier keeps this off unreplicated executor
    // blocks at scale: block loss during a big compaction must not lose
    // the partitions being rewritten.
    val materialized = graft.core.Materialize.frontier(affected)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    materialized
      .repartition(col("frame"), col("symbol"), col("date"))
      .sortWithinPartitions("symbol", "ts_ns")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("frame", "symbol", "date")
      .parquet(root)
    keys.length.toLong
  }

  /** O5: data files, most recently modified first (ref: the reference's
    * recent-first listing surface) — metadata only, no data scan. Empty or
    * missing store lists as zero rows; statuses come from one listStatus
    * per parent directory, not one RPC per file.
    */
  def listFilesRecent(limit: Int = 100): DataFrame = {
    import spark.implicits._
    val files =
      try spark.read.option("basePath", root).parquet(root).inputFiles
      catch { case _: org.apache.spark.sql.AnalysisException => Array.empty[String] }
    val conf = spark.sparkContext.hadoopConfiguration
    val byDir = files.map(new org.apache.hadoop.fs.Path(_)).groupBy(_.getParent)
    val rows = byDir.toSeq.flatMap { case (dir, children) =>
      val names = children.map(_.getName).toSet
      dir.getFileSystem(conf).listStatus(dir)
        .filter(st => names.contains(st.getPath.getName))
        .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
    }
    rows.toDF("path", "bytes", "mod_time")
      .orderBy(org.apache.spark.sql.functions.desc("mod_time"),
        org.apache.spark.sql.functions.col("path"))
      .limit(limit)
  }

  /** Existing (symbol, date) pairs for one frame from the partition
    * DIRECTORY names alone — the file-index listing, zero parquet footer
    * or data-page reads. `select distinct symbol, date` over the frame
    * would open every file's footer (millions of reads at 100 TB); the
    * hive directory structure already IS that distinct set.
    */
  def partitionDays(frameName: String): DataFrame = {
    import spark.implicits._
    val files =
      try spark.read.option("basePath", root).parquet(root).inputFiles
      catch { case _: org.apache.spark.sql.AnalysisException => Array.empty[String] }
    val re = ("frame=" + java.util.regex.Pattern.quote(frameName) +
      "/symbol=([^/]+)/date=(\\d{4}-\\d{2}-\\d{2})$").r.unanchored
    val pairs = files.iterator
      .map(f => new org.apache.hadoop.fs.Path(f).getParent.toString)
      .toSet[String]
      .flatMap(d => re.findFirstMatchIn(d).map(m => (m.group(1), m.group(2))))
      .toSeq.sorted
    pairs.toDF("symbol", "date").withColumn("date", to_date(col("date")))
  }

  /** Storage stats (ref: parquet_engine.py:500-535): file count, bytes —
    * from the file index, no data scan.
    */
  def stats(): DataFrame = {
    val files = spark.read.option("basePath", root).parquet(root).inputFiles
    import spark.implicits._
    val sizes = files.toSeq.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (f, fs.getFileStatus(p).getLen)
    }.toDF("path", "bytes")
    sizes.agg(count("*").as("files"), sum("bytes").as("total_bytes"))
  }
}

object ParquetStore {

  /** F11: extract the partition date from a file path (ref:
    * cli/prune.py:96-137 — `date=` prefix, bare YYYY-MM-DD, or Y/M/D dirs).
    * Use with `input_file_name()` on datasets whose layout predates the
    * `date` partition column.
    */
  def dateFromPath(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val fromPrefix = regexp_extract(path, "date=(\\d{4}-\\d{2}-\\d{2})", 1)
    val bare = regexp_extract(path, "(\\d{4}-\\d{2}-\\d{2})", 1)
    val ymd = concat_ws("-",
      regexp_extract(path, "year=(\\d{4})", 1),
      regexp_extract(path, "month=(\\d{2})", 1),
      regexp_extract(path, "day=(\\d{2})", 1))
    to_date(when(fromPrefix =!= "", fromPrefix)
      .when(bare =!= "", bare)
      .when(ymd.rlike("^\\d{4}-\\d{2}-\\d{2}$"), ymd))
  }

  /** Append with keep-last dedup on (symbol, ts_ns): new rows win over
    * existing ones, reproducing pandas `keep="last"` with an explicit
    * ingest-order column (ref: parquet_engine.py:127-182; SURVEY §7.4.4).
    */
  def appendDedup(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val cols = Seq("symbol", "ts_ns", "open", "high", "low", "close", "volume")
    val tagged = existing.select(cols.map(col): _*).withColumn("_ingest_seq", lit(0))
      .unionByName(incoming.select(cols.map(col): _*).withColumn("_ingest_seq", lit(1)))
    val w = Window.partitionBy("symbol", "ts_ns").orderBy(col("_ingest_seq").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "_ingest_seq")
  }
}
