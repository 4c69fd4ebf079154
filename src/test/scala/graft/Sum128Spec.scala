package graft

import org.apache.spark.sql.functions._

import graft.engine.expr.Sum128

/**
 * Sum128 / squareSum128 equal the BigDecimal formulation they replace —
 * including across forced partial-aggregation merges (repartition before
 * the agg so map-side partials + final merge both execute), negative
 * inputs (sign-extended 128-bit addends), and low-word carry propagation
 * (values sized so Σx² crosses 2^64 many times).
 */
class Sum128Spec extends SparkTestBase {

  test("squareSum128 over random scaled longs equals the BigDecimal reference") {
    val rnd = new scala.util.Random(3)
    // scaled-6 values up to ±5e9 (|v| ≤ 5000.0) — squares ~2.5e19 > 2^64,
    // so the low-word carry fires constantly
    val xs = Seq.fill(5000)((rnd.nextDouble() * 1e10 - 5e9).toLong)
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x").repartition(7)
    val got = df.agg(Sum128.squareSum(col("x"), 12).as("s"))
      .collect()(0).getDecimal(0)
    val want = xs.map(x => BigInt(x) * BigInt(x)).sum
    assert(BigDecimal(got.unscaledValue()) === BigDecimal(want))
    assert(got.scale === 12)
  }

  test("sum128 with negative values equals the BigDecimal reference") {
    val rnd = new scala.util.Random(9)
    val xs = Seq.fill(5000)(rnd.nextLong() / 1000)
    val df = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x").repartition(5)
    val got = df.agg(Sum128.sum(col("x"), 6).as("s"))
      .collect()(0).getDecimal(0)
    val want = xs.map(BigInt(_)).sum
    assert(BigDecimal(got.unscaledValue()) === BigDecimal(want))
  }

  test("SQL-registered sum128/square_sum128 equal the Column builders") {
    graft.functions.GraftFunctions.registerAll(spark)
    val xs = Seq(3L, -4L, 5L, 1000000L)
    spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
      .createOrReplaceTempView("sum128_t")
    val viaSql = spark.sql(
      "SELECT sum128(x, 6) AS s, square_sum128(x, 12) AS q FROM sum128_t")
      .collect()(0)
    val viaCol = spark.table("sum128_t")
      .agg(Sum128.sum(col("x"), 6).as("s"), Sum128.squareSum(col("x"), 12).as("q"))
      .collect()(0)
    assert(viaSql.getDecimal(0).compareTo(viaCol.getDecimal(0)) === 0)
    assert(viaSql.getDecimal(1).compareTo(viaCol.getDecimal(1)) === 0)
    assert(viaSql.getDecimal(1).unscaledValue().longValueExact() ===
      xs.map(x => x * x).sum)
  }

  test("squareSum128 on grouped data equals SUM of the decimal squares") {
    // the exact q129 pass-2 shape: per-group Σdev² via the decimal chain
    // vs via unscaled + squareSum128 — bit-identical decimals
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(2000)((rnd.nextInt(4), rnd.nextDouble() * 1000 - 500))
    val df = spark.createDataFrame(rows).toDF("g", "v").repartition(6)
    val vDec = col("v").cast("decimal(12,6)")
    val viaDecimal = df.groupBy("g")
      .agg(sum((vDec * vDec).cast("decimal(25,12)")).cast("decimal(38,12)").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val via128 = df.groupBy("g")
      .agg(Sum128.squareSum(Sum128.unscaled(vDec), 12).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(via128.keySet === viaDecimal.keySet)
    via128.foreach { case (g, d) =>
      assert(d.compareTo(viaDecimal(g)) === 0, s"group $g: $d vs ${viaDecimal(g)}")
    }
  }
}
