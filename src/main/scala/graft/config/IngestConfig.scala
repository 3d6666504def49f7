package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Versioned YAML ingestion-job configuration (ref:
  * src/marketpipe/config/ingestion.py:19-120, config/loader.py:24-110):
  * snake_case or kebab-case keys, strict unknown-key rejection, symbol
  * normalization, date-order and bounds validation, and a config_version
  * gate that refuses configs newer than this binary understands.
  */
final case class IngestConfig(
    configVersion: String,
    symbols: Seq[String],
    start: String, // YYYY-MM-DD
    end: String,
    batchSize: Int = 1000,
    provider: String = "barfeed",
    feedType: String = "iex",
    timeframe: String = "1m",
    outputPath: String = "./data",
    workers: Int = 4)

final class ConfigVersionError(msg: String) extends RuntimeException(msg)
final class ConfigError(msg: String) extends RuntimeException(msg)

object IngestConfig {
  val CurrentVersion = "1"

  private val knownKeys = Set(
    "config_version", "symbols", "start", "end", "batch_size",
    "provider", "feed_type", "timeframe", "output_path", "workers")

  private val validTimeframes = Set("1m", "5m", "15m", "1h", "4h", "1d")
  private val symbolRe = "^[A-Z0-9.\\-]{1,10}$".r

  /** kebab-case -> snake_case (ref loader.py:89-101). */
  private def normKey(k: String): String = k.replace('-', '_')

  def load(path: String): IngestConfig = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val node =
      try mapper.readTree(new java.io.File(path))
      catch { case e: Exception => throw new ConfigError(s"unreadable config $path: ${e.getMessage}") }
    if (node == null || !node.isObject) throw new ConfigError(s"config $path is not a YAML mapping")
    fromNode(node, path)
  }

  def loadString(yaml: String): IngestConfig =
    fromNode(new ObjectMapper(new YAMLFactory()).readTree(yaml), "<inline>")

  private def fromNode(node: JsonNode, where: String): IngestConfig = {
    val fields = node.fieldNames().asScala.map(k => normKey(k) -> node.get(k)).toMap
    val unknown = fields.keySet.diff(knownKeys)
    if (unknown.nonEmpty)
      throw new ConfigError(s"unknown config keys in $where: ${unknown.toSeq.sorted.mkString(", ")}")

    val version = fields.get("config_version").map(_.asText).getOrElse(CurrentVersion)
    if (version.toIntOption.isEmpty)
      throw new ConfigVersionError(s"config_version must be an integer string, got '$version'")
    if (version.toInt > CurrentVersion.toInt)
      throw new ConfigVersionError(
        s"this binary understands config_version $CurrentVersion, file declares $version — upgrade required")

    val symbols = fields.get("symbols") match {
      case Some(n) if n.isArray && n.size() > 0 =>
        n.elements().asScala.map(_.asText.trim.toUpperCase).toSeq
      case _ => throw new ConfigError("symbols must be a non-empty list")
    }
    symbols.foreach(sym =>
      if (symbolRe.findFirstIn(sym).isEmpty)
        throw new ConfigError(s"invalid symbol '$sym' (1-10 chars of A-Z 0-9 . -)"))

    def dateField(k: String): String = {
      val v = fields.getOrElse(k, throw new ConfigError(s"$k is required")).asText
      try { java.time.LocalDate.parse(v); v }
      catch { case _: Exception => throw new ConfigError(s"$k must be YYYY-MM-DD, got '$v'") }
    }
    val start = dateField("start"); val end = dateField("end")
    if (java.time.LocalDate.parse(end).isBefore(java.time.LocalDate.parse(start)))
      throw new ConfigError(s"end ($end) must be >= start ($start)")

    val batch = fields.get("batch_size").map(_.asInt).getOrElse(1000)
    if (batch < 1 || batch > 10000) throw new ConfigError(s"batch_size out of [1,10000]: $batch")
    val workers = fields.get("workers").map(_.asInt).getOrElse(4)
    if (workers < 1 || workers > 32) throw new ConfigError(s"workers out of [1,32]: $workers")
    val timeframe = fields.get("timeframe").map(_.asText).getOrElse("1m")
    if (!validTimeframes.contains(timeframe))
      throw new ConfigError(s"invalid timeframe '$timeframe' (${validTimeframes.toSeq.sorted.mkString("/")})")

    IngestConfig(
      configVersion = version,
      symbols = symbols,
      start = start, end = end,
      batchSize = batch,
      provider = fields.get("provider").map(_.asText).getOrElse("barfeed"),
      feedType = fields.get("feed_type").map(_.asText).getOrElse("iex"),
      timeframe = timeframe,
      outputPath = fields.get("output_path").map(_.asText).getOrElse("./data"),
      workers = workers)
  }
}
