package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/**
 * Row-group skipping demonstration (r08, VERDICT r07 "what's missing" #2).
 *
 * The sorted/z-ordered layout operators (q109/q122) exist to enable
 * parquet ROW-GROUP skipping: a pushed range predicate compared against
 * per-row-group min/max stats lets the reader never deserialize groups
 * whose range cannot match. The driver testdata writes 1 file × 1 row
 * group at every sf, so that value has been structurally undemonstrable
 * on driver data since r5 (standing escalation). This spec closes the
 * demonstration at the LIBRARY level by writing its own multi-row-group
 * fixtures (`parquet.block.size` is a writer knob, not an engine fork):
 * the SAME rows, same predicate, same file count — clustered layout reads
 * a fraction of the rows off disk, scattered layout reads them all.
 * The scan node's `numOutputRows` metric counts rows the parquet reader
 * actually produced (after group skipping, before the residual Filter),
 * which is exactly the quantity layout work buys down.
 */
class RowGroupSkipSpec extends SparkTestBase {

  private val n = 400000L

  /** One physical file, many row groups (~64 KiB each), rows carrying a
    * (key, padding) pair; `ordered` controls whether key is clustered
    * (sorted run) or scattered (bit-reversed-ish permutation). */
  private def writeFixture(ordered: Boolean): String = {
    val dir = Files.createTempDirectory("rg_fix").toString + "/t"
    val base = spark.range(n).select(
      (if (ordered) col("id") else expr(s"(id * 48271) % $n")).as("k"),
      expr("repeat('x', 40)").as("pad"))
    // one task -> one file; the tiny block size flushes a row group every
    // ~64 KiB, so the single file carries hundreds of groups with
    // per-group k min/max stats. The scattered control keeps generation
    // order (k is an LCG permutation, so every group's [min,max] spans
    // nearly the whole domain); the clustered variant sorts on k.
    val laid = if (ordered) base.coalesce(1).sortWithinPartitions("k")
               else base.coalesce(1)
    laid.write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(dir)
    dir
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("a clustered multi-row-group file skips groups under a pushed range predicate") {
    val lo = 150000L
    val hi = 151000L
    val clustered = spark.read.parquet(writeFixture(ordered = true))
      .where(col("k").between(lo, hi))
    val matched = clustered.count()
    assert(matched === (hi - lo + 1))
    val clusteredScan = scanRows(
      spark.read.parquet(writeFixture(ordered = true))
        .where(col("k").between(lo, hi)))
    val scatteredScan = scanRows(
      spark.read.parquet(writeFixture(ordered = false))
        .where(col("k").between(lo, hi)))
    // scattered: every group's [min,max] straddles the predicate range, so
    // nothing is skipped and the reader produces ~all n rows. Clustered:
    // only the handful of groups covering [lo,hi] survive the stats check.
    assert(scatteredScan >= (n * 9) / 10,
      s"scattered control unexpectedly skipped: $scatteredScan of $n rows read")
    assert(clusteredScan <= n / 10,
      s"clustered layout did not skip row groups: $clusteredScan of $n rows read " +
        "(is the fixture single-group? check parquet.block.size handling)")
    // and both layouts agree on the answer, of course
    val sc = spark.read.parquet(writeFixture(ordered = false))
      .where(col("k").between(lo, hi)).count()
    assert(sc === matched)
  }

  test("the q109 clustered-write recipe skips row groups on a multi-group rewrite") {
    // The shipped rangeClusteredWrite at driver-data sizes emits 1-group
    // files (nothing to skip INSIDE a file; its per-FILE pruning is
    // asserted in PlanSuite/WarehouseSpec). Same recipe + a small writer
    // block size on a bigger synthetic table = the 100 TB shape: range
    // partitioning ACROSS files, sorted groups WITHIN each, and a narrow
    // range predicate touches a sliver of both.
    val dir = Files.createTempDirectory("rg_q109").toString + "/t"
    spark.range(n).select(
        (col("id") % 997).cast("long").as("n_chars"),
        concat(lit("s"), (col("id") % 7)).as("source"),
        expr("repeat('y', 40)").as("pad"))
      .repartitionByRange(8, col("n_chars"), col("source"))
      .sortWithinPartitions("n_chars", "source")
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(dir)
    val pred = col("n_chars").between(200, 220)
    val read = spark.read.parquet(dir).where(pred)
    val got = scanRows(read)
    val matched = spark.read.parquet(dir).where(pred).count()
    assert(matched > 0)
    assert(got <= n / 5,
      s"clustered q109-style layout read $got of $n rows for a ~2% range")
  }
}
