package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Events-independent streaming smoke (r06, VERDICT r05 #5).
  *
  * The entire streaming family shares ONE input table, so in r05 a single
  * drifted column in `/root/testdata/events.parquet` darkened all 10
  * streaming oracles at once. These tests run the real SparkEntry pipelines
  * (q42 watermark dedup, q85 native sessions, q104 ledger dedup) over
  * SYNTHESIZED fixtures in a temp dir — in BOTH ts encodings the generator
  * has produced — so streaming logic stays test-verified even when the
  * driver's testdata shifts under us.
  */
class StreamFixtureSpec extends SparkTestBase {
  import spark.implicits._

  /** 240 events, 5 users, irregular spacing: within-user gaps ≈ 8 min
    * (sessions merge, gap < 10 min) with an hour jump every 50 events
    * (sessions break); total span ≈ 10.5 h so the final watermark
    * (max − 1 h) finalizes most windows/sessions. */
  private lazy val fixtureEvents: DataFrame = spark.sql(
    """SELECT id AS event_id,
      |  timestampadd(SECOND, CAST(id * 97 + (id div 50) * 3600 AS INT),
      |               timestamp'2024-03-01 00:00:00') AS ts,
      |  id % 5 AS user_id,
      |  CASE WHEN id % 3 = 0 THEN 'view' ELSE 'purchase' END AS event_type,
      |  CAST(id AS DOUBLE) / 10 AS value,
      |  '{"k":1}' AS props
      |FROM range(240)""".stripMargin)

  /** doc_ids 200–319; head class (the first-5-token fingerprint) =
    * doc_id div 10, EXCEPT ids divisible by 16 which get class 20 — a
    * ledger class. So: ledger docs (< 250) own classes 20–24; stream docs
    * (≥ 250) mostly carry fresh classes 25–31 with ~10 claimants each
    * (exercising the min-doc_id intra-stream claim path), while 256/272/
    * 288/304 carry ledger class 20 (exercising the ledger-hit drop path). */
  // NOTE: the head token must vary in FIRST CHAR or LENGTH per class — the
  // engine-portable token code is ascii(first char)*31 + length, so 'h25'
  // and 'h26' would collide into one fingerprint.
  private lazy val fixtureDocs: DataFrame = spark.sql(
    """SELECT id AS doc_id,
      |  concat_ws(' ', chr(97 + cls - 20), chr(97 + cls - 20),
      |    'alpha', 'beta', 'gamma', 'body', CAST(id AS STRING)) AS text,
      |  'en' AS lang, 'synthetic' AS source, CAST(20 AS BIGINT) AS n_chars
      |FROM (SELECT id, CASE WHEN id % 16 = 0 THEN 20 ELSE id div 10 END AS cls
      |      FROM range(200, 320))""".stripMargin)

  private def mkFixtureDir(ntz: Boolean): String = {
    val dir: Path = Files.createTempDirectory(s"stream_fix_${if (ntz) "ntz" else "ns"}")
    val ev = if (ntz) fixtureEvents.withColumn("ts", col("ts").cast(TimestampNTZType))
             else fixtureEvents.withColumn("ts", expr("unix_micros(ts) * 1000"))
    ParquetFixtures.writeSingleFile(ev, dir, "events")
    ParquetFixtures.writeSingleFile(fixtureDocs, dir, "documents")
    dir.toString
  }

  private lazy val ntzDir = mkFixtureDir(ntz = true)
  private lazy val nsDir = mkFixtureDir(ntz = false)

  private def sortedRows(df: DataFrame): Seq[Row] = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).orderBy(cols: _*).collect().toSeq
  }

  test("q42 watermark dedup runs on a synthesized fixture, both ts encodings") {
    val onNtz = SparkEntry.queries("q42_stream_watermark_dedup")(spark, ntzDir)
    val got = sortedRows(onNtz)
    assert(got.nonEmpty)
    // batch-expected = the oracle shape: tumbling counts over finalized
    // windows (wstart + 1h <= max_ts - 1h), duplicate-free despite the
    // self-union in the pipeline.
    fixtureEvents.createOrReplaceTempView("fix_events")
    val expected = sortedRows(spark.sql(
      """WITH mx AS (SELECT MAX(ts) AS mt FROM fix_events),
        |w AS (SELECT date_trunc('hour', ts) AS wstart, event_type, COUNT(*) AS n
        |      FROM fix_events GROUP BY 1, 2)
        |SELECT wstart, event_type, n FROM w, mx
        |WHERE wstart + INTERVAL 1 HOUR <= mt - INTERVAL 1 HOUR""".stripMargin))
    assert(got === expected)
    // the ns-long encoding yields the identical emitted set
    assert(sortedRows(
      SparkEntry.queries("q42_stream_watermark_dedup")(spark, nsDir)) === expected)
  }

  test("a stream that finalizes ZERO windows returns empty instead of throwing (r08)") {
    // 90-minute span: the watermark (max − 1 h) never passes any window
    // end, so append mode emits NOTHING. Before r08 the foreachBatch sink
    // only wrote non-empty batches, so the final read hit a nonexistent
    // path and the query THREW on this perfectly legal input; the
    // unconditional write guarantees the sink dir (with empty part files)
    // always exists.
    val dir: Path = Files.createTempDirectory("stream_fix_short")
    val shortSpan = spark.sql(
      """SELECT id AS event_id,
        |  timestampadd(SECOND, CAST(id * 22 AS INT),
        |               timestamp'2024-03-01 00:00:00') AS ts,
        |  id % 5 AS user_id,
        |  CASE WHEN id % 3 = 0 THEN 'view' ELSE 'purchase' END AS event_type,
        |  CAST(id AS DOUBLE) / 10 AS value,
        |  '{"k":1}' AS props
        |FROM range(240)""".stripMargin) // 240 * 22 s ≈ 88 min total span
    ParquetFixtures.writeSingleFile(shortSpan, dir, "events")
    val got = SparkEntry.queries("q42_stream_watermark_dedup")(spark, dir.toString)
    assert(got.count() === 0L, "no window is finalized inside a 90-minute span")
  }

  test("q85 native session windows run on a synthesized fixture, both ts encodings") {
    val got = sortedRows(SparkEntry.queries("q85_stream_session_native")(spark, ntzDir))
    assert(got.nonEmpty)
    // batch-expected: gaps-and-islands with session_window's >= boundary,
    // restricted to watermark-finalized sessions (q85's oracle recipe).
    fixtureEvents.createOrReplaceTempView("fix_events")
    val expected = sortedRows(spark.sql(
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM fix_events),
        |s AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e),
        |g AS (
        |  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
        |         COUNT(*) AS n_events
        |  FROM s GROUP BY user_id, sid)
        |SELECT session_start, user_id, n_events FROM g
        |WHERE session_last + INTERVAL 10 MINUTE
        |      <= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM fix_events)""".stripMargin))
    assert(expected.nonEmpty)
    assert(got === expected)
    assert(sortedRows(
      SparkEntry.queries("q85_stream_session_native")(spark, nsDir)) === expected)
  }

  test("q104 ledger dedup runs on a synthesized documents fixture") {
    val got = sortedRows(SparkEntry.queries("q104_stream_incremental_dedup")(spark, ntzDir))
    assert(got.nonEmpty)
    // batch-expected mirrors q70's anti-join semantics with the same native
    // fingerprint column the pipeline uses.
    val fp = graft.functions.GraftFunctions.headFingerprint("text", 5)
    val withFp = fixtureDocs.select(col("doc_id"), fp.as("fingerprint"))
    val ledger = withFp.where(col("doc_id") < 250).select("fingerprint").distinct()
    val expected = sortedRows(withFp.where(col("doc_id") >= 250)
      .join(ledger, Seq("fingerprint"), "left_anti")
      .groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_claims"))
      .select("doc_id", "fingerprint", "n_claims"))
    assert(expected.nonEmpty)
    // multi-claimant classes prove the min-doc_id survivor rule ran
    assert(expected.exists(_.getAs[Long]("n_claims") > 1L))
    assert(got === expected)
  }
}
