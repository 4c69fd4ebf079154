package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.MergeUpsert

/** MergeUpsert (the q73 update-mode sink): correctness of the merged
  * snapshot AND the bounded-rewrite property — a batch rewrites only its
  * touched buckets, never the whole target (VERDICT r02 #1). */
class MergeUpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert merges inserts and updates; snapshot is exact") {
    val dir = Files.createTempDirectory("mu").toString + "/t"
    val b1 = (1L to 100L).map(k => (k, k * 10)).toDF("k", "v")
    MergeUpsert.upsertBatch(spark, dir, b1, Seq("k"), numBuckets = 16)
    // batch 2: update 3 keys, insert 2 new ones
    val b2 = Seq((5L, 999L), (6L, 999L), (7L, 999L), (101L, 1L), (102L, 2L))
      .toDF("k", "v")
    MergeUpsert.upsertBatch(spark, dir, b2, Seq("k"), numBuckets = 16)
    val got = MergeUpsert.snapshot(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (1L to 100L).map(k => k -> k * 10).toMap ++
      Map(5L -> 999L, 6L -> 999L, 7L -> 999L, 101L -> 1L, 102L -> 2L)
    assert(got == expected)
  }

  test("a small batch rewrites only its touched buckets, not the snapshot") {
    val dir = Files.createTempDirectory("mu").toString + "/t"
    val numBuckets = 16
    val b1 = (1L to 1000L).map(k => (k, k)).toDF("k", "v")
    val carried1 = MergeUpsert.upsertBatch(spark, dir, b1, Seq("k"), numBuckets)
    assert(carried1 == 0L, "first batch has no pre-existing rows to carry")
    val b2 = Seq((1L, -1L), (2L, -2L)).toDF("k", "v")
    val carried2 = MergeUpsert.upsertBatch(spark, dir, b2, Seq("k"), numBuckets)
    // The 2 updated keys touch ≤2 of 16 buckets (~62 rows each); the other
    // ≥14 buckets (≥875 of the 1000 snapshot rows) must NOT be rewritten.
    val maxTouched = 2
    val avgBucket = 1000.0 / numBuckets
    assert(carried2 < maxTouched * avgBucket * 2,
      s"carried $carried2 rows — rewrite not bounded to touched buckets")
    assert(carried2 < 1000 / 2, s"carried $carried2 of 1000 — snapshot-scale rewrite")
    // and the merge is still exact
    val got = MergeUpsert.snapshot(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == -1L && got(2L) == -2L && got(3L) == 3L && got.size == 1000)
  }

  test("untouched bucket files are physically untouched across a batch") {
    val dir = Files.createTempDirectory("mu").toString + "/t"
    val b1 = (1L to 200L).map(k => (k, k)).toDF("k", "v")
    MergeUpsert.upsertBatch(spark, dir, b1, Seq("k"), numBuckets = 8)
    def fileSet() = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = fileSet()
    MergeUpsert.upsertBatch(spark, dir, Seq((1L, 0L)).toDF("k", "v"), Seq("k"), 8)
    val after = fileSet()
    // every bucket directory except the one holding k=1 keeps its exact files
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.nonEmpty, "dynamic overwrite rewrote every bucket")
    survivors.foreach(p => assert(before(p) == after(p)))
    val rewrittenBuckets = (before.keySet -- survivors)
      .map(p => p.split("/").find(_.startsWith("__bucket=")).get)
    assert(rewrittenBuckets.size <= 1,
      s"one updated key must rewrite at most one bucket, got $rewrittenBuckets")
  }
}
