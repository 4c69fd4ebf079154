package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.GraftOptimizations

/** The declarative window-top-k idiom must silently plan as the custom
  * bounded-heap operator once the graft optimizations are installed. */
class RewriteWindowTopKSpec extends SparkTestBase {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.engine.Tables.table(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("o_orderstatus", "o_orderkey", "o_totalprice") // rn pruned
  }

  test("window top-k idiom rewrites to TopKPerGroup when rank is pruned") {
    GraftOptimizations.install(spark)
    val df = windowTopK(3)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerGroup"), s"rule did not fire:\n$optimized")
    // the full Window operator must be gone; Spark's WindowGroupLimit
    // (map-side pre-pruning) may remain below — that's a bonus, not a miss
    assert(!optimized.contains("Window ["), optimized)
  }

  test("rewritten plan returns identical rows to the window formulation") {
    GraftOptimizations.install(spark)
    val rewritten = windowTopK(3).orderBy("o_orderstatus", "o_orderkey")
      .collect().map(_.toSeq).toSeq
    // genuine window path: temporarily uninstall the rule
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.RewriteWindowTopK)
    val reference =
      try windowTopK(3).orderBy("o_orderstatus", "o_orderkey")
        .collect().map(_.toSeq).toSeq
      finally spark.experimental.extraOptimizations = saved
    assert(rewritten == reference)
  }

  test("rule does not fire when the rank column is still needed") {
    GraftOptimizations.install(spark)
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = graft.engine.Tables.table(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_orderstatus", "o_orderkey", "rn")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Window"), optimized)
    assert(!optimized.contains("TopKPerGroup"), optimized)
  }
}
