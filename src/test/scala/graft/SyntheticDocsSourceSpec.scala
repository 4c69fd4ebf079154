package graft

/** Partition-slicing edge cases for the DataSource V2 connector: no id may
  * be dropped or duplicated at slice boundaries under any (rows,
  * partitions) combination. */
class SyntheticDocsSourceSpec extends SparkTestBase {

  private def load(rows: Long, partitions: Int) =
    spark.read.format("graft.sources.SyntheticDocsSource")
      .option("rows", rows.toString).option("partitions", partitions.toString)
      .load()

  test("row count and id completeness across uneven splits") {
    for ((rows, parts) <- Seq((10L, 4), (3L, 8), (1L, 1), (1000L, 7), (16L, 16))) {
      val df = load(rows, parts)
      assert(df.count() == rows, s"rows=$rows parts=$parts")
      val ids = df.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == (0L until rows), s"rows=$rows parts=$parts ids=$ids")
    }
  }

  test("generation contract matches rowFor") {
    val row = load(100, 4).where("doc_id = 42").collect().head
    val (id, lang, nTokens, checksum) = graft.sources.SyntheticDocsSource.rowFor(42L)
    assert(row.getLong(0) == id)
    assert(row.getString(1) == lang)
    assert(row.getInt(2) == nTokens)
    assert(row.getLong(3) == checksum)
  }
}
