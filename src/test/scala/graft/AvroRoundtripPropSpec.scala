package graft

import org.apache.avro.Schema
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.avro.AvroSchemaConverter

/** Property test: toGenericRecord ∘ toRow is the identity over randomized
  * values of the converter's supported type surface — primitives,
  * union-with-null nullability, nested record, string arrays, maps. (The
  * fixture-schema roundtrip in AvroContainerSpec pins logical types; this
  * spec fuzzes the structural types.) */
class AvroRoundtripPropSpec extends AnyFunSuite {

  private val avsc =
    """{"type":"record","name":"P","fields":[
      |  {"name":"id",    "type":"long"},
      |  {"name":"name",  "type":["null","string"], "default":null},
      |  {"name":"score", "type":"double"},
      |  {"name":"flag",  "type":"boolean"},
      |  {"name":"small", "type":"int"},
      |  {"name":"tags",  "type":{"type":"array","items":"string"}},
      |  {"name":"attrs", "type":{"type":"map","values":"long"}},
      |  {"name":"inner", "type":{"type":"record","name":"I","fields":[
      |      {"name":"a","type":"int"},{"name":"b","type":"string"}]}}
      |]}""".stripMargin
  private val schema = new Schema.Parser().parse(avsc)

  private val asciiStr = Gen.alphaNumStr.map(_.take(12))

  private val rowGen = for {
    id    <- Gen.long
    name  <- Gen.option(asciiStr)
    score <- Gen.chooseNum(-1e9, 1e9)
    flag  <- Gen.oneOf(true, false)
    small <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    tags  <- Gen.listOf(asciiStr).map(_.take(5))
    attrs <- Gen.mapOf(Gen.zip(asciiStr.suchThat(_.nonEmpty), Gen.long)).map(_.take(5))
    a     <- Gen.chooseNum(-1000, 1000)
    b     <- asciiStr
  } yield org.apache.spark.sql.Row(
    id, name.orNull, score, flag, small, tags, attrs,
    org.apache.spark.sql.Row(a, b))

  test("Row -> GenericRecord -> Row identity on randomized structural values") {
    // raw scalacheck sampling (scalatestplus bridge is not on the offline
    // classpath): 200 fixed-seed samples — deterministic, reproducible
    val rows = (0 until 200).flatMap(i =>
      rowGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(rows.size >= 150, s"generator discarded too many samples: ${rows.size}")
    rows.foreach { row =>
      val rec = AvroSchemaConverter.toGenericRecord(row, schema)
      val back = AvroSchemaConverter.toRow(rec)
      assert(back == row, s"roundtrip altered the row:\n  in:  $row\n  out: $back")
    }
  }
}
