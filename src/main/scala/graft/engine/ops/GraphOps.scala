package graft.engine.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{QueryDef, Tables}
import graft.operators.Graph

/**
 * Graph-analytics surface (r06-late): iterative message-passing queries
 * over graphs DERIVED from the event stream — the "related items",
 * influence-ranking, and navigation-structure questions a behavioral
 * dataset answers once its transitions are treated as edges. The generic
 * iterative machinery lives in [[graft.operators.Graph]]; each query here
 * binds it to a concrete derived edge set plus the deterministic
 * presentation (scaled-integer ranks, total-order sort, LIMIT).
 *
 * Determinism (SURVEY §2 contract): rank mass is scaled BIGINT with
 * integer division only (Spark `div` ≡ DuckDB `//` on the non-negative
 * operands here), so the unrolled WITH-chain oracle is bit-exact.
 */
object GraphOps {

  // --- q139: PageRank over the item-transition graph -----------------------
  // Nodes = items (props.$.k); a directed edge src→dst with weight w means
  // "users moved from item src to item dst w times" (per-user ts,event_id
  // order; self-loops dropped). 3 synchronous iterations, damping 85/100,
  // from a uniform start — the classic "which items does user traffic
  // structurally concentrate on" ranking, where in-degree alone would
  // overweight items fed by low-rank spam nodes.
  //
  // Scale: the edge build is ONE window pass over events (shuffle on
  // user_id — q138's exact shape) + one map-side-combined count; the
  // persisted edge aggregate is |item-pairs| rows regardless of event
  // count, and every iteration shuffles only node-keyed aggregates — the
  // co-partitioned join a real cluster runs. Nothing collected but the
  // node-count scalar (house precedent: Dedup's convergence aggregate).
  private val q139 = QueryDef(
    "q139_pagerank",
    """WITH ev AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |  FROM events),
      |seq AS (
      |  SELECT user_id, k,
      |    LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pk
      |  FROM ev WHERE k IS NOT NULL),
      |edges AS (
      |  SELECT pk AS src, k AS dst, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM seq WHERE pk IS NOT NULL AND pk <> k GROUP BY 1, 2),
      |nodes AS (SELECT DISTINCT src AS v FROM edges UNION SELECT DISTINCT dst FROM edges),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
      |e AS (SELECT edges.src, edges.dst, edges.w, outw.ow
      |      FROM edges JOIN outw USING (src)),
      |r1 AS (
      |  SELECT nodes.v,
      |    (15000000000000 // (100 * nn.n)) + (85 * COALESCE(c.c, 0)) // 100 AS pr
      |  FROM nodes LEFT JOIN (
      |    SELECT e.dst AS v, SUM(((1000000000000 // nn.n) * e.w) // e.ow) AS c
      |    FROM e, nn GROUP BY e.dst) c ON c.v = nodes.v, nn),
      |r2 AS (
      |  SELECT nodes.v,
      |    (15000000000000 // (100 * nn.n)) + (85 * COALESCE(c.c, 0)) // 100 AS pr
      |  FROM nodes LEFT JOIN (
      |    SELECT e.dst AS v, SUM((r1.pr * e.w) // e.ow) AS c
      |    FROM e JOIN r1 ON r1.v = e.src GROUP BY e.dst) c ON c.v = nodes.v, nn),
      |r3 AS (
      |  SELECT nodes.v,
      |    (15000000000000 // (100 * nn.n)) + (85 * COALESCE(c.c, 0)) // 100 AS pr
      |  FROM nodes LEFT JOIN (
      |    SELECT e.dst AS v, SUM((r2.pr * e.w) // e.ow) AS c
      |    FROM e JOIN r2 ON r2.v = e.src GROUP BY e.dst) c ON c.v = nodes.v, nn)
      |SELECT v AS item, CAST(pr AS BIGINT) AS pr_scaled FROM r3
      |ORDER BY pr_scaled DESC, item LIMIT 25""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = Tables.table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .where(col("k").isNotNull)
      .withColumn("pk", lag(col("k"), 1).over(w))
      .where(col("pk").isNotNull && col("pk") =!= col("k"))
      .groupBy(col("pk").as("src"), col("k").as("dst"))
      .agg(count(lit(1)).as("w"))
    Graph.pagerank(edges, iters = 3, d = 85)
      .select(col("v").as("item"), col("pr").cast("bigint").as("pr_scaled"))
      .orderBy(col("pr_scaled").desc, col("item")).limit(25)
  }

  def defs: Seq[QueryDef] = Seq(q139)
}
