package graft.sources

import graft.core.Schemas
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSourceV2 batch source for paged provider bar feeds — the
  * DISTRIBUTED fetch path (SURVEY §2.1 S13's "custom DataSourceV2 later"):
  *
  *   spark.read.format("graft-provider")
  *     .option("provider", "polygon").option("symbols", "AAPL,MSFT,...")
  *     .option("startNs", ...).option("endNs", ...)
  *     .option("baseUrl", ...).option("apiKey", ...).load()
  *
  * One InputPartition per symbol: each EXECUTOR drains its own symbol's
  * page stream through the full vendor-dialect client (rate limit, retry,
  * Retry-After, auth) and emits canonical bar rows. A 5,000-symbol
  * universe fetches with 5,000-way parallelism instead of the driver-side
  * page loop of [[PagedProviderSource]] (which remains the single-job
  * path). Vendor dialects resolve by registry NAME on the executor, so
  * only built-in providers (or ones registered in every JVM) are valid
  * here — exactly the reference's entry-point discovery constraint.
  */
final class ProviderSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-provider"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.bars

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ProviderTable(properties.asScala.toMap)
}

private[sources] final class ProviderTable(props: Map[String, String])
  extends Table with SupportsRead {

  override def name(): String =
    s"graft-provider(${props.getOrElse("provider", "?")})"
  override def schema(): StructType = Schemas.bars
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // CaseInsensitiveStringMap lowercases its keys; fold everything to
    // lowercase so option lookup is reliable whichever path supplied it
    val merged = (props.map { case (k, v) => k.toLowerCase -> v } ++
      options.asScala.map { case (k, v) => k.toLowerCase -> v }).toMap
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = Schemas.bars
      override def toBatch: Batch = this
      override def description(): String = name()

      // fail a misconfigured read (typo'd key, unknown provider, missing
      // endpoint) at PLANNING time on the driver — not per-task on every
      // executor after the job has launched
      private def required(key: String): String =
        merged.get(key).filter(_.nonEmpty).getOrElse(throw
          new IllegalArgumentException(s"graft-provider requires option '$key'"))

      override def planInputPartitions(): Array[InputPartition] = {
        val symbols = merged.getOrElse("symbols", "")
          .split(",").map(_.trim).filter(_.nonEmpty)
        require(symbols.nonEmpty, "graft-provider requires option 'symbols'")
        val provider = required("provider")
        require(ProviderRegistry.get(provider).nonEmpty,
          s"unknown provider '$provider' " +
            s"(registered: ${ProviderRegistry.list().mkString(",")})")
        if (ProviderRegistry.needsEndpoint(provider)) required("baseurl")
        symbols.map(s => ProviderSymbolPartition(s): InputPartition).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val provider = required("provider")
        ProviderReaderFactory(
          provider = provider,
          baseUrl =
            if (ProviderRegistry.needsEndpoint(provider)) required("baseurl")
            else merged.getOrElse("baseurl", "http://fake"),
          apiKey = merged.getOrElse("apikey", ""),
          authParam = merged.getOrElse("authparam", "token"),
          pageLimit = merged.getOrElse("pagelimit", "10000").toInt,
          startNs = merged.getOrElse("startns", "0").toLong,
          endNs = merged.getOrElse("endns", Long.MaxValue.toString).toLong)
      }
    }
  }
}

private[sources] final case class ProviderSymbolPartition(symbol: String)
  extends InputPartition

/** Serializable recipe for building the vendor client executor-side. */
private[sources] final case class ProviderReaderFactory(
    provider: String, baseUrl: String, apiKey: String, authParam: String,
    pageLimit: Int, startNs: Long, endNs: Long)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val symbol = partition.asInstanceOf[ProviderSymbolPartition].symbol
    new PartitionReader[InternalRow] {
      private lazy val records: Iterator[PagedProviderSource.ProviderRecord] = {
        val factory = ProviderRegistry.get(provider).getOrElse(
          throw new IllegalArgumentException(
            s"unknown provider '$provider' on executor " +
              s"(registered: ${ProviderRegistry.list().mkString(",")})"))
        val cfg = ClientConfig(baseUrl = baseUrl, apiKey = apiKey,
          pageLimit = pageLimit)
        val auth: AuthStrategy =
          if (apiKey.isEmpty) AuthStrategy.NoAuth
          else AuthStrategy.QueryTokenAuth(authParam, apiKey)
        factory(cfg, auth, new JdkHttpClient)
          .pages(symbol, startNs, endNs).flatten
      }
      private var row: InternalRow = _

      override def next(): Boolean = {
        while (records.hasNext) {
          val r = records.next()
          PagedProviderSource.translate(r) match {
            case Some(b) =>
              row = InternalRow(
                UTF8String.fromString(b.symbol), b.ts_ns,
                b.open, b.high, b.low, b.close, b.volume)
              return true
            case None => // anti-corruption drop, keep draining
          }
        }
        false
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
