package graft.engine.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{QueryDef, Tables}

/**
 * Data-quality / observability surface (round 6): the monitoring shapes a
 * production ingest pipeline runs beside its analytics — outlier detection,
 * distribution-drift scoring between time windows, EWMA smoothing,
 * corpus novelty, funnel conversion, and robust (winsorized) statistics.
 *
 * Cross-engine exactness discipline (SURVEY §2 determinism contract): all
 * fractional math is DECIMAL with explicit widths (the q44 ratio pattern);
 * variance comparisons are integer-scaled (multiply through by n instead of
 * dividing — no sqrt, no float reduction order); EWMA weights are exact
 * powers of two so the weighted sum is a pure decimal dot product.
 */
object QualityOps {

  // --- q129: outlier detection (z-score shape, rational arithmetic) -------
  // Flags events whose squared deviation exceeds 9× the population variance
  // of their event_type (|z| > 3) WITHOUT ever computing a float stddev:
  // pass 1 = decimal mean per type; pass 2 = decimal Σ(v−mean)² per type;
  // the flag compares dev²·n > 9·Σdev² — multiply through by n so no
  // division (and no engine-specific sqrt/rounding) touches the decision.
  // Scale: two map-side-combined aggregations over events + a 5-row
  // broadcast join back; nothing pairwise, the monitor is one scan per pass
  // at any corpus size. Decimal widths carry |v| ≤ 1e6 and n ≤ 1e7 rows per
  // group exactly; beyond that widen (25,12)→(30,12) — documented, not
  // silent overflow (both engines raise on decimal overflow).
  private val q129 = QueryDef(
    "q129_outlier_zscore",
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) / COUNT(*) AS DECIMAL(38,6)) AS mean
      |  FROM events GROUP BY event_type),
      |d AS (
      |  SELECT e.event_id, e.event_type, e.value,
      |    CAST(CAST(CAST(e.value AS DECIMAL(18,6)) - m.mean AS DECIMAL(12,6)) *
      |         CAST(CAST(e.value AS DECIMAL(18,6)) - m.mean AS DECIMAL(12,6)) AS DECIMAL(25,12)) AS dev2,
      |    m.n FROM events e JOIN m USING (event_type)),
      |v AS (
      |  SELECT event_type, CAST(SUM(dev2) AS DECIMAL(28,12)) AS var_sum FROM d GROUP BY event_type)
      |SELECT d.event_id, d.event_type, d.value,
      |  CAST(CAST(ROUND(CAST(d.dev2 * CAST(d.n AS DECIMAL(7,0)) AS DECIMAL(38,12)), 6) AS DECIMAL(24,6)) AS DOUBLE) AS score,
      |  CAST(CAST(ROUND(CAST(9 * v.var_sum AS DECIMAL(30,12)), 6) AS DECIMAL(24,6)) AS DOUBLE) AS bound
      |FROM d JOIN v USING (event_type)
      |WHERE CAST(d.dev2 * CAST(d.n AS DECIMAL(7,0)) AS DECIMAL(38,12)) > CAST(9 * v.var_sum AS DECIMAL(30,12))
      |ORDER BY event_id LIMIT 500""".stripMargin) { (s, dir) =>
    val events = Tables.table(s, dir, "events")
    val vDec = col("value").cast("decimal(18,6)")
    val mAgg = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(vDec).cast("decimal(18,6)") / count(lit(1)))
          .cast("decimal(38,6)").as("mean"))
    // Bounded collect-for-broadcast: the per-type stats are ≤ |event_type|
    // rows (an enum — 5 values). Materializing pass 1 once means its
    // corpus scan is not re-executed by BOTH consumers below (the var pass
    // and the stats join) — the plan goes 4 scans → the textbook 3.
    val m = s.createDataFrame(
      java.util.Arrays.asList(mAgg.collect(): _*), mAgg.schema)
    val dev = (vDec - col("mean")).cast("decimal(12,6)")
    val d = events.join(broadcast(m), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        (dev * dev).cast("decimal(25,12)").as("dev2"), col("n"))
    val v = d.groupBy("event_type")
      .agg(sum(col("dev2")).cast("decimal(28,12)").as("var_sum"))
    // Per-group stats in ONE broadcast, with double shadows of mean/bound
    // for the sieve below.
    val stats = m.join(v, Seq("event_type"))
      .select(col("event_type"), col("n"), col("mean"), col("var_sum"),
        col("mean").cast("double").as("mean_d"),
        col("var_sum").cast("double").as("var_sum_d"))
    val devX = (vDec - col("mean")).cast("decimal(12,6)")
    val dev2X = (devX * devX).cast("decimal(25,12)")
    val score = (dev2X * col("n").cast("decimal(7,0)")).cast("decimal(38,12)")
    val bound = (lit(9) * col("var_sum")).cast("decimal(30,12)")
    // Sieve-then-exact (StressQuality finding, r06-late): the exact
    // DECIMAL(38,12) predicate costs ~3 BigDecimal multiplies PER ROW
    // (215 s CPU over 10M rows — Spark decimals wider than 18 digits
    // leave the compact-Long fast path). A codegen double pre-filter with
    // a 1% conservative margin keeps every row the exact predicate could
    // keep (double relative error ≤ 1e-13 and the 6dp value quantization
    // ≤ 1e-4 relative here — both ≪ 1%), so the exact decimal test runs
    // on the tiny candidate set only and the RESULT is bit-identical.
    val sieve = pow(col("value") - col("mean_d"), 2) * col("n") >
      lit(8.91) * col("var_sum_d")
    // The 12-scale decimals stay exact for the FILTER; the displayed
    // score/bound are ROUND(·,6)-ed then narrowed before the double cast:
    // a 19-significant-digit DECIMAL(38,12)→DOUBLE cast double-rounds
    // differently across engines, and DuckDB's decimal DOWNSCALE cast
    // truncates where Spark's rounds — explicit ROUND agrees in both.
    events.join(broadcast(stats), Seq("event_type"))
      .where(sieve)
      .where(score > bound)
      .select(col("event_id"), col("event_type"), col("value"),
        round(score, 6).cast("decimal(24,6)").cast("double").as("score"),
        round(bound, 6).cast("decimal(24,6)").cast("double").as("bound"))
      .orderBy("event_id").limit(500)
  }

  // --- q130: distribution drift between time windows (TVD) ----------------
  // Total-variation distance between the value histogram of the first half
  // of the month and the second, per event_type — the drift monitor every
  // ingest pipeline alarms on. TVD = ½ Σ_bins |p1 − p2| is fully rational
  // (unlike KL/PSI's ln) so the decimal chain is exact cross-engine.
  // Scale: ONE scan → ≤ (types × 10 bins) rows; the window totals run over
  // that tiny aggregate, not the raw data. Bin boundaries are fixed-width
  // (value/50 clamped to 0..9) — content-independent, so the same query
  // compares any two ingest batches.
  private val q130 = QueryDef(
    "q130_drift_tvd",
    """WITH b AS (
      |  SELECT event_type,
      |    LEAST(9, CAST(FLOOR(value / 50.0) AS INT)) AS bin,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS early
      |  FROM events),
      |c AS (
      |  SELECT event_type, bin,
      |    CAST(SUM(early) AS BIGINT) AS n1, CAST(SUM(1 - early) AS BIGINT) AS n2
      |  FROM b GROUP BY event_type, bin),
      |w AS (
      |  SELECT event_type, bin, n1, n2,
      |    SUM(n1) OVER (PARTITION BY event_type) AS tot1,
      |    SUM(n2) OVER (PARTITION BY event_type) AS tot2
      |  FROM c)
      |SELECT event_type,
      |  CAST(MAX(tot1) AS BIGINT) AS tot1, CAST(MAX(tot2) AS BIGINT) AS tot2,
      |  CAST(CAST(CAST(SUM(ABS(CAST(CAST(CAST(n1 AS DECIMAL(18,6)) / tot1 AS DECIMAL(38,6))
      |        - CAST(CAST(n2 AS DECIMAL(18,6)) / tot2 AS DECIMAL(38,6)) AS DECIMAL(38,6)))) AS DECIMAL(18,6)) / 2 AS DECIMAL(38,6)) AS DOUBLE) AS tvd
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val events = Tables.table(s, dir, "events")
    val binned = events.select(col("event_type"),
      least(lit(9), floor(col("value") / 50.0).cast("int")).as("bin"),
      when(col("ts") < lit("2024-01-16").cast("timestamp"), 1).otherwise(0).as("early"))
    val counts = binned.groupBy("event_type", "bin")
      .agg(sum(col("early")).as("n1"), sum(lit(1) - col("early")).as("n2"))
    val w = Window.partitionBy("event_type")
    val withTot = counts
      .withColumn("tot1", sum(col("n1")).over(w))
      .withColumn("tot2", sum(col("n2")).over(w))
    def ratio(n: String, tot: String) =
      (col(n).cast("decimal(18,6)") / col(tot)).cast("decimal(38,6)")
    withTot.groupBy("event_type")
      .agg(max(col("tot1")).as("tot1"), max(col("tot2")).as("tot2"),
        (sum(abs((ratio("n1", "tot1") - ratio("n2", "tot2")).cast("decimal(38,6)")))
          .cast("decimal(18,6)") / lit(2)).cast("decimal(38,6)")
          .cast("double").as("tvd"))
      .orderBy("event_type")
  }

  // --- q131: EWMA smoothing (exact power-of-two weights) ------------------
  // Per-user exponentially-weighted moving average (α = ½, 8 taps) over the
  // event stream — the time-series smoother dashboards chart. The classic
  // recursive EWMA can't be cross-engine exact (float accumulation order);
  // this truncated form makes the weighted sum a DECIMAL dot product with
  // INTEGER weights 2^(7−k), so the result is bit-identical in any engine.
  // Catalyst fuses all 8 lag() calls over the same window spec into ONE
  // WindowExec — a single partition-by-user sort pass, no self-joins.
  // Scale: one shuffle on user_id; state per row is 8 small decimals.
  private val ewmaLagsSql = (0 to 7).map(k =>
    s"COALESCE(CAST(lag(v, $k) OVER w * ${1 << (7 - k)} AS DECIMAL(22,6)), CAST(0 AS DECIMAL(22,6)))")
    .mkString(" + ")
  private val ewmaDenSql = (0 to 7).map(k =>
    s"CASE WHEN lag(v, $k) OVER w IS NULL THEN 0 ELSE ${1 << (7 - k)} END")
    .mkString(" + ")
  private val q131 = QueryDef(
    "q131_ewma_smooth",
    s"""WITH t AS (SELECT user_id, event_id, ts, CAST(value AS DECIMAL(18,6)) AS v
       |           FROM events WHERE user_id < 30),
       |e AS (
       |  SELECT user_id, event_id, ts,
       |    CAST($ewmaLagsSql AS DECIMAL(18,6)) AS num,
       |    $ewmaDenSql AS den
       |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, event_id,
       |  CAST(CAST(num / den AS DECIMAL(38,6)) AS DOUBLE) AS ewma
       |FROM e ORDER BY user_id, ts, event_id LIMIT 1000""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val base = Tables.table(s, dir, "events")
      .where(col("user_id") < 30)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
    val num = (0 to 7).map { k =>
      coalesce((lag(col("v"), k).over(w) * lit(1 << (7 - k)))
        .cast("decimal(22,6)"), lit(0).cast("decimal(22,6)"))
    }.reduce(_ + _).cast("decimal(18,6)")
    val den = (0 to 7).map { k =>
      when(lag(col("v"), k).over(w).isNull, 0).otherwise(1 << (7 - k))
    }.reduce(_ + _)
    base.select(col("user_id"), col("event_id"), col("ts"),
      num.as("num"), den.as("den"))
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("num") / col("den")).cast("decimal(38,6)").cast("double").as("ewma"))
      .orderBy("user_id", "ts", "event_id")
      .select("user_id", "event_id", "ewma")
      .limit(1000)
  }

  // --- q132: corpus n-gram novelty -----------------------------------------
  // Per-document novelty = fraction of its distinct 3-gram shingles whose
  // FIRST corpus occurrence (min doc_id) is this document — the curation
  // signal that separates fresh content from boilerplate echo. Reuses the
  // q46/q78 engine-portable polynomial shingle hash so the oracle sees the
  // identical gram universe. Scale: explode → one gram-keyed aggregation
  // (map-side combined) + one postings join back — the q101/q120 shape;
  // no all-pairs, gram cardinality bounds the shuffle.
  private val q132 = QueryDef(
    "q132_ngram_novelty",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
      |           WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(l) - 1),
      |    i -> (((CAST(ascii(substr(l[i],1,1))*31 + length(l[i]) AS BIGINT)) * 131
      |          + (ascii(substr(l[i+1],1,1))*31 + length(l[i+1]))) * 131
      |          + (ascii(substr(l[i+2],1,1))*31 + length(l[i+2]))) % 1000000007)) AS sh
      |  FROM t),
      |p AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |f AS (SELECT g, MIN(doc_id) AS first_doc FROM p GROUP BY g)
      |SELECT p.doc_id, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(CAST(CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS DECIMAL(18,6)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS novelty
      |FROM p JOIN f USING (g)
      |GROUP BY p.doc_id ORDER BY p.doc_id LIMIT 300""".stripMargin) { (s, dir) =>
    import graft.functions.GraftFunctions
    val p = Tables.table(s, dir, "documents")
      .withColumn("l", split(col("text"), " "))
      .where(size(col("l")) >= 3)
      .select(col("doc_id"), explode(GraftFunctions.hashedShingles("l")).as("g"))
    val f = p.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    p.join(f, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0)).as("n_novel"),
        (sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0))
          .cast("decimal(18,6)") / count(lit(1))).cast("decimal(38,6)")
          .cast("double").as("novelty"))
      .orderBy("doc_id").limit(300)
  }

  // --- q133: ordered funnel conversion -------------------------------------
  // view → click (≤24 h later) → purchase (≤24 h after that click): the
  // product-analytics staple. Stage k+1's anchor is stage k's MIN(ts), so
  // the pipeline is (agg on user) → (join on user) → (agg on user) chained —
  // every shuffle is on the SAME key (user_id), so a real cluster
  // co-partitions all three stages; no window over raw events, no
  // sequence-explode. Output is the one-row conversion summary.
  private val q133 = QueryDef(
    "q133_event_funnel",
    """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY e.user_id)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
      |  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
      |  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_purchase,
      |  CAST(CAST(CAST((SELECT COUNT(*) FROM c) AS DECIMAL(18,6)) / (SELECT COUNT(*) FROM v) AS DECIMAL(38,6)) AS DOUBLE) AS conv_click,
      |  CAST(CAST(CAST((SELECT COUNT(*) FROM p) AS DECIMAL(18,6)) / (SELECT COUNT(*) FROM c) AS DECIMAL(38,6)) AS DOUBLE) AS conv_purchase""".stripMargin) { (s, dir) =>
    // LEFT-JOIN CHAIN, each stage computed ONCE: the naive formulation
    // (separate v/c/p sets, then three COUNT subqueries) re-executes the
    // view aggregate up to 4× and the click stage 2× — at corpus scale
    // that's 6 scans for a 3-stage funnel. Here each filtered scan runs
    // once; users that miss a stage carry NULL forward, and the single
    // final aggregate counts non-nulls per stage.
    val events = Tables.table(s, dir, "events")
    val u1 = events.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"))
    val u2 = u1.join(clicks,
        col("user_id") === col("c_user") && col("cts") > col("t1") &&
          col("cts") <= col("t1") + expr("INTERVAL 24 HOURS"), "left")
      .groupBy("user_id", "t1").agg(min(col("cts")).as("t2"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"))
    val u3 = u2.join(purchases,
        col("user_id") === col("p_user") && col("pts") > col("t2") &&
          col("pts") <= col("t2") + expr("INTERVAL 24 HOURS"), "left")
      .groupBy("user_id", "t1", "t2").agg(min(col("pts")).as("t3"))
    u3.agg(count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_view_click_purchase"))
      .select(col("n_view"), col("n_view_click"), col("n_view_click_purchase"),
        (col("n_view_click").cast("decimal(18,6)") / col("n_view"))
          .cast("decimal(38,6)").cast("double").as("conv_click"),
        (col("n_view_click_purchase").cast("decimal(18,6)") / col("n_view_click"))
          .cast("decimal(38,6)").cast("double").as("conv_purchase"))
  }

  // --- q134: winsorized (robust) statistics --------------------------------
  // Per event_type: clamp values into [p05, p95] (exact percentiles, q58's
  // round-to-2dp parity recipe) and report clip counts + the winsorized
  // mean — the robust-stats guard that keeps q129-style monitors from being
  // dominated by the tail they're hunting. Scale: percentile is the one
  // sort-based aggregate (per-group sort, q58's cost model); the clamp pass
  // is a 5-row broadcast join + one map-side-combined aggregation.
  private val q134 = QueryDef(
    "q134_winsorize",
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(ROUND(percentile_cont(0.05) WITHIN GROUP (ORDER BY value), 2) AS DECIMAL(18,2)) AS p05,
      |    CAST(ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 2) AS DECIMAL(18,2)) AS p95
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN e.value < CAST(q.p05 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN e.value > CAST(q.p95 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  CAST(CAST(CAST(SUM(CAST(LEAST(GREATEST(CAST(e.value AS DECIMAL(18,6)), CAST(q.p05 AS DECIMAL(18,6))), CAST(q.p95 AS DECIMAL(18,6))) AS DECIMAL(18,6))) AS DECIMAL(18,6)) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS mean_winsor
      |FROM events e JOIN q USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin) { (s, dir) =>
    val events = Tables.table(s, dir, "events")
    val q = events.groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.05)"), 2).cast("decimal(18,2)").as("p05"),
        round(expr("percentile(value, 0.95)"), 2).cast("decimal(18,2)").as("p95"))
    val clamped = least(greatest(col("value").cast("decimal(18,6)"),
      col("p05").cast("decimal(18,6)")), col("p95").cast("decimal(18,6)"))
      .cast("decimal(18,6)")
    events.join(broadcast(q), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("p05").cast("double"), 1).otherwise(0)).as("n_low"),
        sum(when(col("value") > col("p95").cast("double"), 1).otherwise(0)).as("n_high"),
        (sum(clamped).cast("decimal(18,6)") / count(lit(1)))
          .cast("decimal(38,6)").cast("double").as("mean_winsor"))
      .orderBy("event_type")
  }

  // --- q135: cohort retention matrix ---------------------------------------
  // Users grouped by their FIRST active day (the cohort anchor); each cell
  // counts how many of a cohort were active again `day_offset` days later —
  // the retention curve every product/engagement dashboard draws. Same
  // scale spine as q133: the distinct (user, day) set, the min-day cohort
  // agg, and the join are ALL keyed on user_id (co-partitioned on a real
  // cluster); the final matrix agg is |cohorts × offsets| — tiny.
  private val q135 = QueryDef(
    "q135_cohort_retention",
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
      |coh AS (SELECT user_id, MIN(d) AS cohort_d FROM uw GROUP BY user_id)
      |SELECT coh.cohort_d, CAST(date_diff('day', coh.cohort_d, uw.d) AS INT) AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM uw JOIN coh USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    // cohort anchor via an UNORDERED window over the distinct set instead
    // of a second events scan + self-join: one corpus scan total, and the
    // min() needs no Sort (unbounded frame), just the user_id exchange the
    // distinct already produced.
    val uw = Tables.table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val w = Window.partitionBy("user_id")
    uw.withColumn("cohort_d", min(col("d")).over(w))
      .groupBy(col("cohort_d"),
        datediff(col("d"), col("cohort_d")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_d", "day_offset")
  }

  def defs: Seq[QueryDef] = Seq(q129, q130, q131, q132, q133, q134, q135)
}
