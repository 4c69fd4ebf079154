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
  // punctuation-bearing, longish, non-ASCII BMP, and astral
  // (surrogate-pair) leads — the case where UTF-16 charAt semantics
  // diverged from ascii()/length() code points before TokenCode (r05)
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('.', ',', '!', '-', '_'),
    2 -> Gen.oneOf('é', '中', '€', 'ß'))
  private val tokenGen: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 10).flatMap(n => Gen.stringOfN(n, charGen)),
    // astral first char: code point 0x1D11E, two UTF-16 units
    1 -> Gen.choose(0, 4).flatMap(n => Gen.stringOfN(n, charGen))
      .map("𝄞" + _),
    // astral mid-token: first char BMP, length still differs in units
    1 -> Gen.choose(0, 4).flatMap(n => Gen.stringOfN(n, charGen))
      .map(s => "a𝄞" + s),
    2 -> Gen.const("")) // empty token = a doubled/leading/trailing space
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

  test("SimHashPack == aggregate formulation on randomized messy text (both bit sources)") {
    import spark.implicits._
    // non-empty texts only: the agg reference loses rows whose token array
    // explodes to nothing, which split() never produces — but the random
    // generator CAN produce the all-empty-token text, equivalent; keep the
    // join total by filtering to texts whose split is non-empty (always).
    val df = samples(300).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    Seq(true, false).foreach { portable =>
      val native = graft.operators.Dedup
        .packedSimhash(df, "doc_id", "text", portable)
      val agg = graft.operators.Dedup
        .packedSimhashViaAgg(df, "doc_id", "text", portable)
        .withColumnRenamed("sh", "sh_agg")
      val joined = native.join(agg, "doc_id")
      assert(joined.count() == df.count(), "agg reference lost rows")
      val mismatches = joined.where(col("sh") =!= col("sh_agg")).count()
      assert(mismatches == 0, s"portable=$portable: $mismatches randomized rows diverge")
    }
  }

  test("BucketPairDots == per-pair DotProduct on randomized buckets") {
    import spark.implicits._
    // buckets of random size 0..12 with 4-dim vectors; the generator must
    // emit exactly the n*(n-1)/2 pairs with the same left-to-right dots
    val vecGen = Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 250.0))
    val rows = (0 until 60).flatMap { b =>
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, vecGen))
        .apply(Gen.Parameters.default, Seed(b.toLong)).toSeq
        .flatMap(vs => vs.zipWithIndex.map { case (v, i) =>
          (b.toLong, b * 100L + i, v.toArray) })
    }
    val df = rows.toDF("bucket", "id", "e")
      .withColumn("e", col("e").cast("array<double>"))
      .withColumn("nrm", sqrt(graft.engine.expr.DotProduct.dot(col("e"), col("e"))))
    val gen = df.groupBy("bucket")
      .agg(collect_list(struct(col("id"), col("e"), col("nrm"))).as("xs"))
      .select(graft.engine.expr.BucketPairDots.of(col("xs"))
        .as(Seq("doc_a", "doc_b", "dot", "na", "nb")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v2 = df.select(col("bucket").as("b2"), col("id").as("id2"), col("e").as("e2"))
    val ref = df.join(v2, col("bucket") === col("b2") && col("id") < col("id2"))
      .select(col("id"), col("id2"),
        graft.engine.expr.DotProduct.dot(col("e"), col("e2")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gen.nonEmpty && gen == ref,
      s"pair dots diverge: onlyGen=${(gen -- ref).take(3)} onlyRef=${(ref -- gen).take(3)}")
  }

  test("ArrayPairs == nested-loop pairs; ArrayEqCount == zip_with on random arrays") {
    import spark.implicits._
    val arrGen = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 20L)))
    val rows = (0 until 200).flatMap(i =>
      arrGen.apply(Gen.Parameters.default, Seed(i.toLong)).map(l => (i.toLong, l)))
    val df = rows.toDF("row_id", "xs")
    // pairs: native generator vs the lambda chain it replaced, per row
    val gen = df.select(col("row_id"),
        graft.engine.expr.ArrayPairs.of(col("xs")).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    rows.foreach { case (id, l) =>
      val expected = for (i <- l.indices; j <- i + 1 until l.size) yield (l(i), l(j))
      assert(gen.getOrElse(id, Seq.empty) == expected,
        s"row $id: pairs diverge from the nested-loop reference")
    }
    // eq count: native vs the interpreted zip_with fold, on equal-length pairs
    val pairs = rows.sliding(2, 2).collect {
      case Seq((_, a), (_, b)) if a.size == b.size && a.nonEmpty => (a, b)
    }.toSeq
    val pdf = pairs.toDF("a", "b")
    val mismatches = pdf.select(
        graft.engine.expr.ArrayEqCount.of(col("a"), col("b")).as("n"),
        expr("aggregate(zip_with(a, b, (x, v) -> IF(x = v, 1, 0)), 0, (acc, x) -> acc + x)").as("m"))
      .where(not(col("n") <=> col("m"))).count()
    assert(mismatches == 0, s"$mismatches randomized rows diverge")
    // strictness: mismatched lengths raise, not truncate
    val err = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(graft.engine.expr.ArrayEqCount.of(col("a"), col("b"))).collect()
    }
    assert(exceptionChainHas(err, "length mismatch"), s"wrong error: $err")
  }

  private def exceptionChainHas(t: Throwable, msg: String): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(e => Option(e.getMessage).exists(_.contains(msg)))

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
