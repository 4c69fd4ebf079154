package graft

import org.apache.spark.sql.functions._

/**
 * ε-bound verification for the two contract-exempt sketch keys (r07,
 * VERDICT r06 "what's missing" #1): q23/q69 are rows-only in the driver's
 * oracle compare (sketch results are engine-specific by SURVEY §2 rule 5),
 * so until now a regression that made the sketches return garbage would
 * still show green rows. These tests bound each sketch against its exact
 * twin on the driver tables — at BOTH sf0.01 (the correctness-gate scale)
 * and sf0.1 (the scale the driver actually benches; r08, VERDICT r07 #2),
 * so the only oracle-exempt keys are verified-by-bound at every scale the
 * harness touches:
 *
 *   - q23 `approx_count_distinct` (HLL++, default rsd 5%) vs q19's exact
 *     per-group COUNT(DISTINCT): within 15% relative error (3× the
 *     standard error — generous enough to never flake, tight enough that
 *     a broken sketch register path fails loudly).
 *   - q69 `approx_percentile(..., accuracy=1000)` vs q58's exact
 *     percentiles: RANK-ε — the approx p50/p90 must lie within the exact
 *     [p45,p55] / [p85,p95] value envelope (rank error 5%, vs the
 *     sketch's guaranteed 1/accuracy = 0.1%).
 */
class SketchBoundSpec extends SparkTestBase {
  // Bound at every scale the harness touches; a missing dir (e.g. a
  // container without the bench-scale data) skips rather than fails —
  // the gate scale sf0.01 is always present.
  private val sfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(d).isDirectory)

  sfDirs.foreach { dir =>
    val sf = dir.split('/').last

    test(s"q23 approx_count_distinct is within 15% of q19's exact counts ($sf)") {
      val approx = SparkEntry.queries("q23_agg_approx_distinct")(spark, dir)
      val exact = SparkEntry.queries("q19_agg_distinct")(spark, dir)
      val joined = approx.select(col("event_type"), col("approx_users"))
        .join(exact.select(col("event_type"), col("n_users")), "event_type")
        .collect()
      assert(joined.nonEmpty, "no groups to compare")
      joined.foreach { r =>
        val a = r.getAs[Long]("approx_users").toDouble
        val n = r.getAs[Long]("n_users").toDouble
        assert(math.abs(a - n) <= 0.15 * n,
          s"event_type=${r.getString(0)}: approx $a vs exact $n exceeds 15%")
      }
    }

    test(s"q69 approx_percentile lands inside the exact rank-ε envelope ($sf)") {
      val approx = SparkEntry.queries("q69_agg_approx_percentile")(spark, dir)
      // Exact rank envelope, computed independently of q58's rounding: the
      // sort-based exact percentile at ranks ±5% around each target.
      val envelope = graft.engine.Tables.table(spark, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.45)").as("p45"),
          expr("percentile(o_totalprice, 0.55)").as("p55"),
          expr("percentile(o_totalprice, 0.85)").as("p85"),
          expr("percentile(o_totalprice, 0.95)").as("p95"))
      val joined = approx.join(envelope, "o_orderstatus").collect()
      assert(joined.nonEmpty, "no groups to compare")
      joined.foreach { r =>
        val st = r.getAs[String]("o_orderstatus")
        val p50 = r.getAs[Double]("p50_approx")
        val p90 = r.getAs[Double]("p90_approx")
        assert(p50 >= r.getAs[Double]("p45") && p50 <= r.getAs[Double]("p55"),
          s"status=$st: approx p50 $p50 outside exact [p45,p55] rank envelope")
        assert(p90 >= r.getAs[Double]("p85") && p90 <= r.getAs[Double]("p95"),
          s"status=$st: approx p90 $p90 outside exact [p85,p95] rank envelope")
      }
    }
  }
}
