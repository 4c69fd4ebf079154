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

  test("withText plants dup triads and a code-discriminating vocabulary") {
    import graft.sources.SyntheticDocsSource.textFor
    // triad contract (the dedup-stress fixture): 10k+2 EXACT copy of 10k,
    // 10k+1 = 10k plus one unique trailing token, others unique streams
    for (base <- Seq(0L, 10L, 1230L)) {
      assert(textFor(base + 2) == textFor(base))
      assert(textFor(base + 1) == textFor(base) + s" u${base + 1}")
    }
    assert(textFor(3L) != textFor(13L))
    // the portable token code (first char × 31 + length) must see a rich
    // vocabulary — a collapsed one turns every doc into one dedup block
    // (measured failure mode: single-letter vocab → block of ALL docs)
    val codes = (0L until 200L).flatMap(id => textFor(id).split(" "))
      .map(t => t.head.toInt * 31 + t.length).distinct
    assert(codes.size >= 50, s"token-code classes collapsed: ${codes.size}")
    // DSv2 read surface returns the text column
    val df = spark.read.format("graft-docs")
      .option("rows", 30).option("partitions", 3).option("withText", "true").load()
    assert(df.columns.contains("text"))
    val r = df.where("doc_id = 12").collect().head
    assert(r.getString(r.fieldIndex("text")) == textFor(12L))
  }
}
