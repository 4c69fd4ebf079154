package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.GraftFunctions

/** Property tests for the native codegen expression family: each native
  * expression must be bit-identical to its interpreted lambda reference on
  * RANDOMIZED inputs, not just the corpus and hand-picked fixtures — the
  * generators deliberately produce empty tokens (leading/trailing/double
  * spaces), single chars, and punctuation. Raw fixed-seed scalacheck
  * sampling (the scalatestplus bridge is not on the offline classpath), so
  * runs are deterministic. */
class NativeExprPropSpec extends SparkTestBase {

  // space-separated "text" with messy token shapes: empties, 1-char,
  // punctuation-bearing, longish
  private val tokenGen: Gen[String] = Gen.frequency(
    3 -> Gen.choose(1, 10).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('.', ',', '!', '-', '_')))),
    1 -> Gen.const("")) // empty token = a doubled/leading/trailing space
  private val textGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString(" "))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("RollingFingerprint == lambda fold on randomized messy text") {
    import spark.implicits._
    val df = samples(300).toDF("text")
    Seq(-1, 1, 2, 7).foreach { k =>
      val native =
        if (k < 0) GraftFunctions.fingerprint("text")
        else GraftFunctions.headFingerprint("text", k)
      val mismatches = df
        .select(native.as("n"), GraftFunctions.fingerprintViaLambdas("text", k).as("m"))
        .where(not(col("n") <=> col("m"))).count()
      assert(mismatches == 0, s"k=$k: $mismatches randomized rows diverge")
    }
  }

  test("HashedShingles == lambda chain on randomized messy token arrays") {
    import spark.implicits._
    val mismatches = samples(300).toDF("text")
      .select(split(col("text"), " ").as("l"))
      .where(size(col("l")) >= 3) // the callers' contract (lambda crashes below)
      .select(GraftFunctions.hashedShingles("l").as("n"),
        GraftFunctions.hashedShinglesViaLambdas("l").as("m"))
      .where(not(col("n") <=> col("m"))).count()
    assert(mismatches == 0, s"$mismatches randomized rows diverge")
  }

  test("LcgMin band keys == lambda array_min on randomized shingle sets") {
    import spark.implicits._
    val mismatches = samples(300).toDF("text")
      .select(split(col("text"), " ").as("l"))
      .where(size(col("l")) >= 3)
      .select(GraftFunctions.hashedShingles("l").as("sh"))
      .select(GraftFunctions.minhashBandKeys("sh").as("n"),
        GraftFunctions.minhashBandKeysViaLambdas("sh").as("m"))
      .where(not(col("n") <=> col("m"))).count()
    assert(mismatches == 0, s"$mismatches randomized rows diverge")
  }

  test("WindowHashes == lambda fold on randomized messy token arrays") {
    import spark.implicits._
    Seq(2, 5, 8).foreach { k =>
      val mismatches = samples(300).toDF("text")
        .select(split(col("text"), " ").as("l"))
        .where(size(col("l")) >= k) // the callers' contract
        .select(graft.operators.Dedup.windowHashes("l", k).as("n"),
          graft.operators.Dedup.windowHashesViaLambdas("l", k).as("m"))
        .where(not(col("n") <=> col("m"))).count()
      assert(mismatches == 0, s"k=$k: $mismatches randomized rows diverge")
    }
  }

  test("globalIndex == naive global ROW_NUMBER, including duplicate keys") {
    import spark.implicits._
    // duplicate-heavy keys exercise the tiebreak and the bucket boundary:
    // keys cluster on few values so several rows share (key) and land in
    // one bucket, and keys span the full [0, keySpace) range
    val keySpace = 1000L
    val rows = (0 until 500).flatMap { i =>
      Gen.zip(Gen.choose(0L, keySpace - 1), Gen.const(i.toLong))
        .apply(Gen.Parameters.default, Seed(i.toLong))
    }
    val df = rows.toDF("k", "tb").repartition(7) // scatter across partitions
    val got = graft.operators.Indexing
      .globalIndex(df, "k", "tb", keySpace, buckets = 8)
      .select("k", "tb", "global_idx")
    val expected = df.withColumn("global_idx",
      row_number().over(Window.orderBy("k", "tb")).cast("long") - 1L)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      "bucketed global index diverges from the naive global ROW_NUMBER")
  }
}
