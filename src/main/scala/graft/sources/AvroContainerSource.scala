package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableFileInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.engine.avro.AvroSchemaConverter

/**
 * DataSource V2 connector for Avro OBJECT-CONTAINER files (`.avro`) — the
 * interchange half of the reference's Avro-as-schema-language surface,
 * built on plain avro-core (the distro ships no spark-avro jar):
 *
 *   spark.read.format("graft.sources.AvroContainerSource")
 *     .option("path", "/data/events").load()
 *
 * Schema comes from the container header of the first file (Avro files are
 * self-describing), mapped through [[AvroSchemaConverter]].
 *
 * Scale design: container files are sequences of compressed blocks
 * separated by 16-byte sync markers, so a single file SPLITS like any
 * columnar format — each input partition covers a byte range and uses
 * `DataFileReader.sync(start)` / `pastSync(end)` to read exactly the
 * blocks whose sync marker falls inside its range. Target split size is
 * controlled by `splitBytes` (default 32 MB); a 100 TB directory therefore
 * fans out to byte-range tasks exactly like a parquet scan, not one task
 * per file.
 */
class AvroContainerSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** Short name (ServiceLoader-registered): `spark.read.format("graft-avro")`. */
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val readerSchema = Option(options.get("avroSchema")).map(new Schema.Parser().parse(_))
      .getOrElse {
        val files = AvroContainerSource.listFiles(options.get("path"))
        require(files.nonEmpty, s"no .avro files under ${options.get("path")}")
        AvroContainerSource.fileSchema(files.head)
      }
    AvroSchemaConverter.toStructType(readerSchema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroContainerTable(properties.get("path"), schema,
      Option(properties.get("splitBytes")).map(_.toLong)
        .getOrElse(32L * 1024 * 1024),
      Option(properties.get("avroSchema")))
}

object AvroContainerSource {
  /** All .avro files under `path` (a file or a directory), stable order. */
  def listFiles(path: String): Seq[File] = {
    val f = new File(path)
    val all =
      if (f.isDirectory) f.listFiles().toSeq.filter(_.getName.endsWith(".avro"))
      else Seq(f)
    all.sortBy(_.getName)
  }

  def fileSchema(file: File): Schema = {
    val r = new DataFileReader[GenericRecord](
      new SeekableFileInput(file), new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Write `df` as one container file per partition under `dir` — the
    * distributed write-back path (Row → GenericRecord → DataFileWriter).
    * The Avro schema travels as its JSON string: avro Schema objects are
    * not serializable task closures. Files are named by partition id; a
    * retried/speculative task overwrites its own file (same id, same
    * deterministic content) — a production deployment would route through
    * a FileCommitProtocol for attempt isolation. */
  def write(df: DataFrame, schema: Schema, dir: String): Unit = {
    val schemaJson = schema.toString
    new File(dir).mkdirs()
    df.rdd.foreachPartition { rows =>
      val sch = new Schema.Parser().parse(schemaJson)
      val part = org.apache.spark.TaskContext.getPartitionId()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, new File(f"$dir/part-$part%05d.avro"))
      try rows.foreach(r => w.append(AvroSchemaConverter.toGenericRecord(r, sch)))
      finally w.close()
    }
  }
}

private class AvroContainerTable(path: String, sparkSchema: StructType,
    splitBytes: Long, readerSchemaJson: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"avro_container($path)"
  override def schema(): StructType = sparkSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      // Projection pushdown: Avro is row-major, so pruning doesn't skip I/O
      // the way parquet does — but it DOES skip the Avro→Row→InternalRow
      // conversion of every unused field, the CPU hot spot of this scan.
      private var required: StructType = sparkSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        AvroContainerSource.listFiles(path).flatMap { f =>
          // byte-range splits; sync() snaps each range start to the next
          // block boundary, so ranges partition the blocks exactly once
          (0L until f.length() by splitBytes).map(start =>
            AvroSplit(f.getPath, start,
              math.min(start + splitBytes, f.length())): InputPartition)
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        AvroReaderFactory(required, readerSchemaJson)
    }
}

/** Serializable factory shipped to executors (must not capture the scan).
  *
  * `readerSchemaJson` enables Avro SCHEMA EVOLUTION: when set, records are
  * resolved from each file's writer schema to this reader schema by
  * avro-core (removed fields dropped, added fields filled from their
  * defaults) — old container files keep reading under a newer schema. */
private case class AvroReaderFactory(required: StructType,
    readerSchemaJson: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val AvroSplit(file, start, end) = partition
    new PartitionReader[InternalRow] {
      private val datumReader = new GenericDatumReader[GenericRecord]()
      readerSchemaJson.foreach(j =>
        datumReader.setExpected(new Schema.Parser().parse(j)))
      private val reader = new DataFileReader[GenericRecord](
        new SeekableFileInput(new File(file)), datumReader)
      reader.sync(start)
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(required)
      private val fieldNames = required.fields.map(_.name).toSeq
      private var rec: GenericRecord = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(end)) {
          rec = reader.next(rec); true
        } else false
      override def get(): InternalRow =
        toCatalyst(AvroSchemaConverter.toRowProjected(rec, fieldNames))
          .asInstanceOf[InternalRow]
      override def close(): Unit = reader.close()
    }
  }
}

private case class AvroSplit(file: String, start: Long, end: Long)
    extends InputPartition
