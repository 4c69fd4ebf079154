package graft.engine.ops

import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}
import graft.operators.Quality

/**
 * Data-quality / observability surface (round 6): the monitoring shapes a
 * production ingest pipeline runs beside its analytics — outlier detection,
 * distribution-drift scoring between time windows, EWMA smoothing,
 * corpus novelty, funnel conversion, robust (winsorized) statistics, and
 * cohort retention.
 *
 * The generic operators live in [[graft.operators.Quality]] (usable on any
 * DataFrame); each query here binds one onto the events/documents tables
 * and adds the deterministic presentation (aliases, total-order sort,
 * LIMIT). Cross-engine exactness discipline (SURVEY §2 determinism
 * contract): all fractional math is DECIMAL with explicit widths (the q44
 * ratio pattern); decision predicates are rational (multiplied through by
 * counts — no sqrt/ln/float-reduction picks rows); wide-decimal predicates
 * run sieve-then-exact (see SCALING.md §Data-quality monitors).
 */
object QualityOps {

  // --- q129: outlier detection (z-score shape, rational arithmetic) -------
  // Flags events whose squared deviation exceeds 9× the population variance
  // of their event_type (|z| > 3) WITHOUT ever computing a float stddev:
  // the flag compares dev²·n > 9·Σdev². Two map-side-combined aggregation
  // passes + broadcast joins; pass 1 (the ≤5-row event_type enum stats) is
  // collected once so neither consumer re-executes it (3 scans total,
  // PlanSuite-pinned). Displayed score/bound are ROUND(·,0)-ed to
  // INTEGERS before the double cast: at full data range a 6dp score
  // carries more significant digits than a double holds, and
  // decimal→double conversion double-rounds differently across engines
  // (found by RandomFixtureParitySpec on spiked fixtures); integers stay
  // double-exact to 2^53. DuckDB's decimal DOWNSCALE cast also truncates
  // where Spark's rounds, hence the explicit ROUND; and the dev multiply
  // is widened to (19,6) operands because DuckDB executes a (12,6)²
  // multiply in int64, which overflows past |dev| ≈ 3037 (same spec).
  private val q129 = QueryDef(
    "q129_outlier_zscore",
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) / COUNT(*) AS DECIMAL(38,6)) AS mean
      |  FROM events GROUP BY event_type),
      |d AS (
      |  SELECT e.event_id, e.event_type, e.value,
      |    CAST(CAST(CAST(e.value AS DECIMAL(18,6)) - m.mean AS DECIMAL(19,6)) *
      |         CAST(CAST(e.value AS DECIMAL(18,6)) - m.mean AS DECIMAL(19,6)) AS DECIMAL(25,12)) AS dev2,
      |    m.n FROM events e JOIN m USING (event_type)),
      |v AS (
      |  SELECT event_type, CAST(SUM(dev2) AS DECIMAL(28,12)) AS var_sum FROM d GROUP BY event_type)
      |SELECT d.event_id, d.event_type, d.value,
      |  CAST(CAST(ROUND(CAST(d.dev2 * CAST(d.n AS DECIMAL(7,0)) AS DECIMAL(38,12)), 0) AS DECIMAL(24,0)) AS DOUBLE) AS score,
      |  CAST(CAST(ROUND(CAST(9 * v.var_sum AS DECIMAL(30,12)), 0) AS DECIMAL(24,0)) AS DOUBLE) AS bound
      |FROM d JOIN v USING (event_type)
      |WHERE CAST(d.dev2 * CAST(d.n AS DECIMAL(7,0)) AS DECIMAL(38,12)) > CAST(9 * v.var_sum AS DECIMAL(30,12))
      |ORDER BY event_id LIMIT 500""".stripMargin) { (s, dir) =>
    Quality.outliers(s, Tables.table(s, dir, "events"), "event_type", "value", z = 3)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("score"), 0).cast("decimal(24,0)").cast("double").as("score"),
        round(col("bound"), 0).cast("decimal(24,0)").cast("double").as("bound"))
      .orderBy("event_id").limit(500)
  }

  // --- q130: distribution drift between time windows (TVD) ----------------
  // Total-variation distance between the value histogram of the first half
  // of the month and the second, per event_type — the drift monitor every
  // ingest pipeline alarms on. TVD = ½ Σ_bins |p1 − p2| is fully rational
  // (unlike KL/PSI's ln) so the decimal chain is exact cross-engine.
  // Scale: ONE scan → ≤ (types × 10 bins) rows; the window totals run over
  // that tiny aggregate, not the raw data.
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
    Quality.tvdDrift(Tables.table(s, dir, "events"), "event_type", "value",
        col("ts") < lit("2024-01-16").cast("timestamp"),
        binWidth = 50.0, nBins = 10)
      .orderBy("event_type")
  }

  // --- q131: EWMA smoothing (exact power-of-two weights) ------------------
  // Per-user exponentially-weighted moving average (α = ½, 8 taps) over the
  // event stream. The classic recursive EWMA can't be cross-engine exact
  // (float accumulation order); the truncated form is a DECIMAL dot product
  // with INTEGER weights 2^(7−k) — bit-identical in any engine, and all 8
  // lag() taps fuse into ONE WindowExec (PlanSuite-pinned).
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
    Quality.ewma(Tables.table(s, dir, "events").where(col("user_id") < 30),
        "user_id", "ts", "event_id", "value", taps = 8)
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
    Quality.novelty(Tables.table(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id").limit(300)
  }

  // --- q133: ordered funnel conversion -------------------------------------
  // view → click (≤24 h later) → purchase (≤24 h after that click): the
  // product-analytics staple, as Quality.funnel's LEFT-JOIN CHAIN — each
  // stage's filtered scan runs exactly once (PlanSuite pins 3 scans), every
  // join/agg is keyed on user_id (co-partitioned on a cluster), and the
  // single final aggregate counts non-nulls per stage.
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
    Quality.funnel(Tables.table(s, dir, "events"), "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), windowHours = 24)
      .agg(count(col("t1")).as("n_view"),
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
  // dominated by the tail they're hunting.
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
    Quality.winsorize(Tables.table(s, dir, "events"), "event_type", "value",
        pLo = 0.05, pHi = 0.95)
      .orderBy("event_type")
  }

  // --- q135: cohort retention matrix ---------------------------------------
  // Users grouped by their FIRST active day (the cohort anchor); each cell
  // counts how many of a cohort were active again `day_offset` days later.
  // ONE corpus scan (PlanSuite-pinned): Quality.retention anchors cohorts
  // with an unordered window min over the distinct (user, day) set instead
  // of a second scan + self-join.
  private val q135 = QueryDef(
    "q135_cohort_retention",
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
      |coh AS (SELECT user_id, MIN(d) AS cohort_d FROM uw GROUP BY user_id)
      |SELECT coh.cohort_d, CAST(date_diff('day', coh.cohort_d, uw.d) AS INT) AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM uw JOIN coh USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Quality.retention(Tables.table(s, dir, "events"), "user_id", "ts")
      .orderBy("cohort_d", "day_offset")
  }

  // --- q137: robust (Tukey-fence / IQR) outliers ---------------------------
  // The rank-based twin of q129's moment rule: rows outside
  // [p25 − 1.5·IQR, p75 + 1.5·IQR] per event_type — immune to the tail
  // inflating the spread estimate (q129's stddev is itself dragged up by
  // the outliers it hunts; the quartiles are not). Fences at decimal
  // scale 3 with NO downscale cast (the q129 lesson: DuckDB truncates a
  // decimal downscale where Spark rounds). Scale: one percentile agg
  // (q58's sort cost) + a 5-row broadcast fence pass.
  private val q137 = QueryDef(
    "q137_outlier_iqr",
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 2) AS DECIMAL(18,2)) AS p25,
      |    CAST(ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY value), 2) AS DECIMAL(18,2)) AS p75
      |  FROM events GROUP BY event_type),
      |f AS (
      |  SELECT event_type,
      |    CAST(p25 - CAST(1.5 AS DECIMAL(2,1)) * CAST(p75 - p25 AS DECIMAL(18,2)) AS DECIMAL(20,3)) AS lo,
      |    CAST(p75 + CAST(1.5 AS DECIMAL(2,1)) * CAST(p75 - p25 AS DECIMAL(18,2)) AS DECIMAL(20,3)) AS hi
      |  FROM q)
      |SELECT e.event_id, e.event_type, e.value,
      |  CAST(f.lo AS DOUBLE) AS fence_lo, CAST(f.hi AS DOUBLE) AS fence_hi
      |FROM events e JOIN f USING (event_type)
      |WHERE CAST(e.value AS DECIMAL(18,6)) < f.lo
      |   OR CAST(e.value AS DECIMAL(18,6)) > f.hi
      |ORDER BY event_id LIMIT 500""".stripMargin) { (s, dir) =>
    Quality.iqrOutliers(Tables.table(s, dir, "events"), "event_type", "value")
      .select("event_id", "event_type", "value", "fence_lo", "fence_hi")
      .orderBy("event_id").limit(500)
  }

  // --- q138: inter-event gap statistics ------------------------------------
  // Median and max gap between consecutive events per user — the cadence
  // profile feeding rate-anomaly alerts and the sessionization gap choice
  // (q41's 10-minute threshold comes from exactly this distribution).
  // One lag() window pass (shuffle on user_id) + the per-user percentile;
  // gaps are exact integer microseconds, and the 0.5-percentile midpoint
  // interpolation is the same (1−f)·lo + f·hi double both engines run.
  private val q138 = QueryDef(
    "q138_interevent_gap",
    """WITH g AS (
      |  SELECT user_id,
      |    CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS gap_us
      |  FROM events)
      |SELECT user_id,
      |  CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
      |  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us), 0) AS BIGINT) AS median_gap_us,
      |  CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id LIMIT 300""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    Tables.table(s, dir, "events")
      .select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
      .where(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(count(col("gap_us")).as("n_gaps"),
        round(expr("percentile(gap_us, 0.5)"), 0).cast("long").as("median_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy("user_id").limit(300)
  }

  // --- q141: exact correlation audit ---------------------------------------
  // corr²·10⁶ between the event value and (a) the item key, (b) the
  // hour-of-day, per event_type — the feature-association check run before
  // a signal column is admitted to training. `Quality.corr2Micro` is the
  // generic API: integer-exact sums in ONE map-side-combined pass, then a
  // single fixed-shape double ratio (IEEE-deterministic on exact integer
  // inputs — the float hazard is reduction ORDER, eliminated by summing
  // integers). corr² keeps it sqrt-free; value is lifted to exact cents.
  private val q141 = QueryDef(
    "q141_corr_audit",
    """WITH base AS (
      |  SELECT event_type,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
      |  FROM events),
      |s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(k) AS BIGINT) AS sk, CAST(SUM(h) AS BIGINT) AS sh,
      |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(k*k) AS BIGINT) AS skk, CAST(SUM(h*h) AS BIGINT) AS shh,
      |    CAST(SUM(x*k) AS BIGINT) AS sxk, CAST(SUM(x*h) AS BIGINT) AS sxh
      |  FROM base GROUP BY event_type)
      |SELECT event_type, n,
      |  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*skk - sk*sk) = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(FLOOR((1000000.0 * CAST(n*sxk - sx*sk AS DOUBLE) * CAST(n*sxk - sx*sk AS DOUBLE)) /
      |      (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*skk - sk*sk AS DOUBLE))) AS BIGINT) END AS corr2_k_micro,
      |  CASE WHEN (n*sxx - sx*sx) = 0 OR (n*shh - sh*sh) = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(FLOOR((1000000.0 * CAST(n*sxh - sx*sh AS DOUBLE) * CAST(n*sxh - sx*sh AS DOUBLE)) /
      |      (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*shh - sh*sh AS DOUBLE))) AS BIGINT) END AS corr2_h_micro
      |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
    val base = Tables.table(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("x"),
        graft.engine.expr.JsonIntKey.of(col("props"), "k").as("k"),
        hour(col("ts")).cast("long").as("h"))
    Quality.corr2Micro(base, "event_type", "x", Seq("k", "h"))
      .orderBy("event_type")
  }

  // --- q148: A/B conversion lift on the hash split --------------------------
  // The experimentation readout: users split into variants by the
  // deterministic key split (user_id % 2 — the q80 admission idea at its
  // simplest), conversion = any high-value purchase (value > 150 ≈ p93 of
  // the purchase distribution, so the rate is non-degenerate), lift =
  // variant conversion vs control in exact ppm (integer division; NULL if
  // the control arm is absent or converts nobody — control is explicitly
  // variant 0, r07). Two map-side-combined aggregation levels
  // (user, then variant) — the per-user MAX collapses before the wire.
  private val q148 = QueryDef(
    "q148_ab_lift",
    """WITH u AS (
      |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
      |    MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY user_id),
      |v AS (
      |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(converted) AS BIGINT) AS n_converted,
      |    CAST(SUM(n_events) AS BIGINT) AS n_events
      |  FROM u GROUP BY variant),
      |w AS (
      |  SELECT variant, n_users, n_converted, n_events,
      |    (n_converted * 1000000) // n_users AS conv_ppm,
      |    MAX(CASE WHEN variant = 0 THEN (n_converted * 1000000) // n_users END) OVER () AS ctrl_ppm
      |  FROM v)
      |SELECT variant, n_users, n_converted, n_events, CAST(conv_ppm AS BIGINT) AS conv_ppm,
      |  CASE WHEN ctrl_ppm IS NULL OR ctrl_ppm = 0 THEN CAST(NULL AS BIGINT)
      |       ELSE CAST((conv_ppm * 1000000) // ctrl_ppm AS BIGINT) END AS lift_vs_control_ppm
      |FROM w ORDER BY variant""".stripMargin) { (s, dir) =>
    val u = Tables.table(s, dir, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" && col("value") > 150, 1)
        .otherwise(0)).as("converted"),
        count(lit(1)).as("n_events"))
      .withColumn("variant", expr("CAST(user_id % 2 AS INT)"))
    val v = u.groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum("converted").as("n_converted"),
        sum("n_events").as("n_events"))
      .withColumn("conv_ppm", expr("(n_converted * 1000000) div n_users"))
    // Control is EXPLICITLY variant 0 (r07, ADVICE r06 #4): the previous
    // FIRST_VALUE(... ORDER BY variant) silently promoted variant 1 to its
    // own control when variant 0 had no users (lift ≡ 1e6); the MAX-over-
    // CASE lookup makes a missing control arm surface as NULL lift instead.
    v.withColumn("ctrl_ppm", expr(
        "max(CASE WHEN variant = 0 THEN conv_ppm END) over ()"))
      .select(col("variant"), col("n_users"), col("n_converted"),
        col("n_events"), col("conv_ppm"),
        expr("""CASE WHEN ctrl_ppm IS NULL OR ctrl_ppm = 0 THEN CAST(NULL AS BIGINT)
               |ELSE (conv_ppm * 1000000) div ctrl_ppm END""".stripMargin)
          .as("lift_vs_control_ppm"))
      .orderBy("variant")
  }

  def defs: Seq[QueryDef] =
    Seq(q129, q130, q131, q132, q133, q134, q135, q137, q138, q141, q148)
}
