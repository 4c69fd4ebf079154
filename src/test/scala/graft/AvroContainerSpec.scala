package graft

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.engine.avro.AvroSchemaConverter
import graft.engine.ops.Formats
import graft.sources.AvroContainerSource

/** Avro object-container I/O (SURVEY §1.1 write path / VERDICT r01 missing
  * item): Row↔GenericRecord roundtrip identity and sync-marker byte-range
  * split exactness. */
class AvroContainerSpec extends SparkTestBase {

  test("Row -> GenericRecord -> Row roundtrip is identity on the fixture schema") {
    val schema = new Schema.Parser().parse(Formats.userEventAvsc)
    Formats.fixtureRecords(schema).foreach { rec =>
      val row = AvroSchemaConverter.toRow(rec)
      val back = AvroSchemaConverter.toGenericRecord(row, schema)
      assert(AvroSchemaConverter.toRow(back) == row,
        s"roundtrip altered record ${rec.get("id")}")
    }
  }

  test("byte-range splits cover a multi-block container exactly once") {
    val avsc =
      """{"type":"record","name":"KV","fields":[
        |  {"name":"id","type":"long"},{"name":"v","type":"string"}]}""".stripMargin
    val schema = new Schema.Parser().parse(avsc)
    val dir = Files.createTempDirectory("avro_split").toString
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1 << 10) // ~1 KB blocks -> many sync points
    w.create(schema, new File(s"$dir/data.avro"))
    val n = 5000
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong); r.put("v", s"value_$i")
      w.append(r)
    }
    w.close()
    val df = spark.read.format("graft.sources.AvroContainerSource")
      .option("path", dir).option("splitBytes", "4096").load()
    // several byte-range partitions, and every record exactly once — the
    // sync()/pastSync() contract assigns each block to exactly one range
    assert(df.rdd.getNumPartitions > 4,
      s"expected multiple byte-range splits, got ${df.rdd.getNumPartitions}")
    assert(df.count() == n)
    assert(df.select("id").distinct().count() == n)
  }

  test("projection pushdown prunes the scan to the selected columns") {
    val schema = new Schema.Parser().parse(Formats.userEventAvsc)
    val rows = Formats.fixtureRecords(schema).map(AvroSchemaConverter.toRow)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      AvroSchemaConverter.toStructType(schema))
    val dir = Files.createTempDirectory("avro_prune").toString
    AvroContainerSource.write(df, schema, s"$dir/out")
    val pruned = spark.read.format("graft.sources.AvroContainerSource")
      .option("path", s"$dir/out").load()
      .select("id", "day")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("id", "day"),
      s"scan should read only (id, day), got ${scan.output.map(_.name)}")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("reader schema evolves old files: added field defaults, removed field dropped") {
    // v1 writer: (id, name); v2 reader adds score (default 0.5), drops name
    val v1 = new Schema.Parser().parse(
      """{"type":"record","name":"E","fields":[
        |  {"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin)
    val v2Json =
      """{"type":"record","name":"E","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"score","type":"double","default":0.5}]}""".stripMargin
    val dir = Files.createTempDirectory("avro_evolve").toString
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](v1))
    w.create(v1, new File(s"$dir/v1.avro"))
    (1 to 3).foreach { i =>
      val r = new GenericData.Record(v1)
      r.put("id", i.toLong); r.put("name", s"n$i")
      w.append(r)
    }
    w.close()
    val evolved = spark.read.format("graft.sources.AvroContainerSource")
      .option("path", dir).option("avroSchema", v2Json).load()
    assert(evolved.columns.toSeq == Seq("id", "score"))
    val got = evolved.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got == Seq((1L, 0.5), (2L, 0.5), (3L, 0.5)))
  }

  test("distributed write produces one container per partition, read merges them") {
    val schema = new Schema.Parser().parse(Formats.userEventAvsc)
    val rows = Formats.fixtureRecords(schema).map(AvroSchemaConverter.toRow)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      AvroSchemaConverter.toStructType(schema))
    val dir = Files.createTempDirectory("avro_write").toString
    AvroContainerSource.write(df, schema, s"$dir/out")
    assert(new File(s"$dir/out").listFiles().count(_.getName.endsWith(".avro")) == 2)
    // short name resolves through the DataSourceRegister service file
    val back = spark.read.format("graft-avro")
      .option("path", s"$dir/out").load()
    assert(back.count() == 3)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
