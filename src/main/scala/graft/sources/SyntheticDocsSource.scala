package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom DataSource V2 connector (the "sources" surface): a deterministic
 * synthetic document generator, registered by class name:
 *
 *   spark.read.format("graft.sources.SyntheticDocsSource")
 *     .option("rows", 1000).option("partitions", 8).load()
 *
 * Schema: (doc_id BIGINT, lang STRING, n_tokens INT, checksum BIGINT) —
 * all derived arithmetically from doc_id, so any engine can recompute the
 * same rows (the DuckDB oracle regenerates them from range()).
 *
 * Scale design: the row range splits evenly into `partitions` input
 * partitions; each PartitionReader streams its slice without
 * materialization, so the source parallelizes like any file scan.
 */
class SyntheticDocsSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** Short name (ServiceLoader-registered): `spark.read.format("graft-docs")`. */
  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SyntheticDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  val langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** The row-generation contract (mirrored by the SQL oracle). */
  def rowFor(id: Long): (Long, String, Int, Long) = {
    val lang = langs((id % 5).toInt)
    val nTokens = (id * 37 % 91 + 10).toInt
    val checksum = (id * 1315423911L) % 1000000007L
    (id, lang, nTokens, checksum)
  }
}

private class SyntheticDocsTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticDocsSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val step = math.max(1L, (rows + partitions - 1) / partitions)
        (0L until rows by step)
          .map(start => DocsRange(start, math.min(start + step, rows)): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val DocsRange(start, end) = partition
          new PartitionReader[InternalRow] {
            private var id = start - 1
            override def next(): Boolean = { id += 1; id < end }
            override def get(): InternalRow = {
              val (docId, lang, nTokens, checksum) = SyntheticDocsSource.rowFor(id)
              InternalRow(docId, UTF8String.fromString(lang), nTokens, checksum)
            }
            override def close(): Unit = ()
          }
        }
    }
}

private case class DocsRange(start: Long, end: Long) extends InputPartition
