package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (SURVEY §5.2): same config shape the
  * driver's Verify uses — local[4], 4 shuffle partitions, UTC. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"

  /** Release the library's tracked long-lived caches after each suite
    * (r07, ADVICE r06 #1): the shared session outlives every suite, so
    * without this the graph/ER caches registered by executed queries
    * would accumulate for the whole `sbt test` JVM. Unpersist is always
    * safe — a later suite that needs the same cache re-registers and
    * re-materializes it. */
  override def afterAll(): Unit = {
    graft.engine.CacheReaper.release()
    super.afterAll()
  }
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // r14 (ADVICE r13 #1): PlanSuite pins assert on node metadata in
    // formatted explain output, which Spark truncates per line at this
    // length (default 100). The q122 pin's PushedFilters line — two
    // 12-13 digit zval literals — sat only a few chars under the default,
    // so a testdata regeneration with longer bounds would truncate the
    // line and fail the pin spuriously. Plan-shape pins must never depend
    // on display truncation.
    .config("spark.sql.maxMetadataStringLength", "4096")
    .getOrCreate()
}
