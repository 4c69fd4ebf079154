package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The public function facade must agree with the oracle-gated query
  * implementations it fronts. */
class GraftFunctionsSpec extends SparkTestBase {

  test("dot / l2Norm / cosineSim are self-consistent on unit vectors") {
    import spark.implicits._
    val df = Seq((Array(3.0, 4.0), Array(4.0, 3.0))).toDF("a", "b")
    val row = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("d"),
      GraftFunctions.l2Norm(col("a")).as("n"),
      GraftFunctions.cosineSim(col("a"), col("b")).as("c")).collect().head
    assert(row.getDouble(0) == 24.0)
    assert(row.getDouble(1) == 5.0)
    assert(row.getDecimal(2) == new java.math.BigDecimal("0.9600"))
  }

  test("fingerprint matches the q46 query implementation") {
    val viaQuery = SparkEntry.queries("q46_text_fingerprint")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = graft.engine.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), GraftFunctions.fingerprint("text").as("fp"))
      .orderBy("doc_id").limit(200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaApi == viaQuery)
  }

  test("dot_product raises on mismatched array lengths (codegen and interpreted)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    // codegen path (whole-stage pipeline)
    val eCodegen = intercept[Exception] {
      df.select(GraftFunctions.dot(col("a"), col("b"))).collect()
    }
    assert(exceptionChain(eCodegen).exists(_.getMessage != null)
      && exceptionChain(eCodegen).exists(m =>
        Option(m.getMessage).exists(_.contains("length mismatch"))),
      s"codegen path did not surface the length error: $eCodegen")
    // interpreted path (expression eval outside codegen)
    val expr = graft.engine.expr.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val eInterp = intercept[IllegalArgumentException] { expr.eval(null) }
    assert(eInterp.getMessage.contains("length mismatch"))
  }

  private def exceptionChain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("registerAll exposes SQL names") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("a b c", Array(1.0, 0.0))).toDF("t", "v").createOrReplaceTempView("gf_t")
    val r = spark.sql(
      "SELECT dot_product(v, v) AS d, (SELECT count(*) FROM (SELECT bigrams(split(t, ' ')) FROM gf_t)) AS nb FROM gf_t")
      .collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 2L)
  }
}
