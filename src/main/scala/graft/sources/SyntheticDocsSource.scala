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
    if (options.getBoolean("withText", false)) SyntheticDocsSource.schemaWithText
    else SyntheticDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("withText", "false").toBoolean)
}

object SyntheticDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Schema when `withText=true`: adds a generated document body. */
  val schemaWithText: StructType =
    schema.add(StructField("text", StringType, nullable = false))

  val langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** The row-generation contract (mirrored by the SQL oracle). */
  def rowFor(id: Long): (Long, String, Int, Long) = {
    val lang = langs((id % 5).toInt)
    val nTokens = (id * 37 % 91 + 10).toInt
    val checksum = (id * 1315423911L) % 1000000007L
    (id, lang, nTokens, checksum)
  }

  /** Deterministic document body for the dedup stress path (`withText`).
    *
    * 30% of docs form planted DUP TRIADS: ids 10k / 10k+1 / 10k+2 share a
    * token-stream seed (and the seed's token count, so the streams align).
    * 10k+1 appends one extra unique token (a NEAR-dup); 10k+2 is an EXACT
    * copy of 10k (exercises signature dedup). The other 70% are unique
    * streams. Cluster sizes are thus bounded (≤3) at every scale while the
    * dup FRACTION stays constant — the distribution blocked dedup must
    * stay linear on.
    * Token vocabulary is 5000 words over an LCG stream, shaped
    * `<letter><number>` so tokens vary in FIRST CHAR (26) and LENGTH (2-5)
    * — the portable token code (first-char ascii × 31 + length) must
    * discriminate ~100 classes, giving a ~10⁶ 3-gram shingle space; a
    * single-letter vocab would collapse every doc into one block.
    * Streaming generation per partition; nothing driver-side.
    */
  def textFor(id: Long): String = {
    val paired = id % 10 <= 2
    val seedBase = if (paired) id / 10 * 10 else id
    val nTokens = (seedBase * 37 % 91 + 10).toInt
    var h = seedBase * 2654435761L + 1000003L
    val sb = new java.lang.StringBuilder(nTokens * 6)
    var j = 0
    while (j < nTokens) {
      h = h * 6364136223846793005L + 1442695040888963407L
      val w = java.lang.Long.remainderUnsigned(h >>> 33, 5000L)
      if (j > 0) sb.append(' ')
      sb.append(('a' + w % 26).toChar).append(w / 26)
      j += 1
    }
    if (id % 10 == 1) sb.append(" u").append(id)
    sb.toString
  }
}

private class SyntheticDocsTable(rows: Long, partitions: Int, withText: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType =
    if (withText) SyntheticDocsSource.schemaWithText else SyntheticDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema()
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val step = math.max(1L, (rows + partitions - 1) / partitions)
        (0L until rows by step)
          .map(start => DocsRange(start, math.min(start + step, rows)): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        DocsReaderFactory(withText)
    }
}

/** Standalone serializable factory (a lambda would capture the scan). */
private case class DocsReaderFactory(withText: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val DocsRange(start, end) = partition
    new PartitionReader[InternalRow] {
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow = {
        val (docId, lang, nTokens, checksum) = SyntheticDocsSource.rowFor(id)
        if (withText)
          InternalRow(docId, UTF8String.fromString(lang), nTokens, checksum,
            UTF8String.fromString(SyntheticDocsSource.textFor(id)))
        else
          InternalRow(docId, UTF8String.fromString(lang), nTokens, checksum)
      }
      override def close(): Unit = ()
    }
  }
}

private case class DocsRange(start: Long, end: Long) extends InputPartition
