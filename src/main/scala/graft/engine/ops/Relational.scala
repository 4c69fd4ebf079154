package graft.engine.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{QueryDef, Tables}

/**
 * Relational query surface (SURVEY §2.1–§2.6): the capabilities the
 * reference demonstrates via Spark SQL over Parquet, re-expressed with the
 * Spark 4.x DataFrame DSL so Catalyst handles pushdown/pruning/join
 * selection. Every query ends in a total order for hash-stable verification.
 *
 * Scale stance (100 TB): no driver-side collection anywhere; dimensions are
 * broadcast; fact-fact joins shuffle on their equi keys only; aggregates are
 * partial+final (map-side combine) over exact DECIMAL so partition order
 * never changes a result.
 */
object Relational {

  /** Money/measure columns arrive as DOUBLE (2-dp values); cast to exact
    * DECIMAL before arithmetic so aggregates are partition-order-independent
    * and identical across engines.
    *
    * Output-representation contract (driver hash check): the FINAL projection
    * of every decimal measure is CAST(... AS DOUBLE) on both sides — the
    * driver loads the DuckDB oracle through pandas where DECIMAL/HUGEINT
    * become float64, so a Spark `Decimal('255262.00')` vs oracle `255262.0`
    * hash-mismatches despite equal values. Both engines convert the same
    * exact decimal to its nearest double (magnitudes here stay ≤1e17, far
    * inside the exactly-convertible range), so the doubles are bit-identical.
    * Likewise every integer SUM in oracle SQL is CAST(... AS BIGINT) to kill
    * DuckDB's HUGEINT→float64 widening. */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  // --- q01: the reference's core demo — scan, project, filter ------------
  // Pushdown check: PushedFilters + 5-column ReadSchema at the Parquet scan.
  private val q01 = QueryDef(
    "q01_scan_project_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity >= 45 AND l_shipdate >= TIMESTAMP '1998-01-01'
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |LIMIT 100""".stripMargin) { (s, dir) =>
    // (l_orderkey, l_linenumber) is NOT unique in this data — order by all
    // output columns for a hash-stable total order at the LIMIT boundary.
    Tables.table(s, dir, "lineitem")
      .where(col("l_quantity") >= 45 && col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .limit(100)
  }

  // --- q04: compound predicates: AND/OR, IN, BETWEEN (timestamps), LIKE --
  private val q04 = QueryDef(
    "q04_filter_complex",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('F','P')
      |  AND o_totalprice BETWEEN 50000 AND 150000
      |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      |ORDER BY o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .where(col("o_orderstatus").isin("F", "P")
        && col("o_totalprice").between(50000, 150000)
        && col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp"))
        && (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey").limit(100)
  }

  // --- q05: string functions over part names ------------------------------
  // Regex stays in [a-z]+ class — identical across java.util.regex and RE2.
  private val q05 = QueryDef(
    "q05_string_funcs",
    """SELECT p_partkey, UPPER(p_name) AS name_upper, SUBSTR(p_name, 1, 5) AS name_pfx,
      |  CONCAT(p_brand, '#', p_type) AS brand_type, LENGTH(p_name) AS name_len,
      |  REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word
      |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
      .orderBy("p_partkey").limit(200)
  }

  // --- q06: date functions: EXTRACT, datediff, date_trunc -----------------
  // Integer/date outputs only (determinism rule 4).
  private val q06 = QueryDef(
    "q06_date_funcs",
    """SELECT o_orderkey,
      |  EXTRACT(year FROM o_orderdate) AS o_year,
      |  EXTRACT(month FROM o_orderdate) AS o_month,
      |  DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
      |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        datediff(to_date(lit("1998-01-01")), to_date(col("o_orderdate"))).as("days_to_98"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .orderBy("o_orderkey").limit(200)
  }

  // --- q07: math functions with exact decimal casts -----------------------
  // FLOOR before int cast: Spark CAST(double AS INT) truncates, DuckDB
  // rounds — FLOOR first makes both exact.
  private val q07 = QueryDef(
    "q07_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(FLOOR(l_quantity) AS INTEGER) % 7 AS qty_mod7,
      |  CAST(CAST(ROUND(ABS(l_discount - 0.05), 2) AS DECIMAL(5,2)) AS DOUBLE) AS disc_dev,
      |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil
      |FROM lineitem
      |WHERE l_quantity > 40
      |ORDER BY l_orderkey, l_linenumber, price_floor, qty_mod7 LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "lineitem")
      .where(col("l_quantity") > 40)
      .select(col("l_orderkey"), col("l_linenumber"),
        (floor(col("l_quantity")).cast("int") % 7).as("qty_mod7"),
        round(abs(col("l_discount") - 0.05), 2).cast("decimal(5,2)").cast("double").as("disc_dev"),
        floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
        ceil(col("l_extendedprice")).cast("bigint").as("price_ceil"))
      .orderBy("l_orderkey", "l_linenumber", "price_floor", "qty_mod7").limit(200)
  }

  // --- q08: JSON extraction from events.props -----------------------------
  private val q08 = QueryDef(
    "q08_json_extract",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) / COUNT(*) AS DECIMAL(38,4)) AS DOUBLE) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.table(s, dir, "events")
      .groupBy("event_type")
      .agg(sum(k).as("sum_k"), count(lit(1)).as("n"),
        (sum(k).cast("decimal(38,0)") / count(lit(1))).cast("decimal(38,4)")
          .cast("double").as("avg_k"))
      .orderBy("event_type")
  }

  // --- q09: array functions over tokenized documents ----------------------
  private val q09 = QueryDef(
    "q09_array_funcs",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ' ') AS first3
      |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin) { (s, dir) =>
    val toks = split(col("text"), " ")
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 3), " ").as("first3"))
      .orderBy("doc_id").limit(200)
  }

  // --- q10: broadcast hash join fact→dim ----------------------------------
  // part is a dimension (20k rows at sf0.1) — explicit broadcast() pins the
  // 100 TB-correct plan: no shuffle of lineitem, map-side join + partial agg.
  private val q10 = QueryDef(
    "q10_join_broadcast",
    """SELECT p_brand, COUNT(*) AS n_lines,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "lineitem")
      .join(broadcast(Tables.table(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("decimal(38,4)").cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  // --- q11: large-large sort-merge join -----------------------------------
  // MERGE hint pins SortMergeJoin (the only strategy that scales when both
  // sides are ~fact-sized); both sides shuffle-partition on the join key.
  private val q11 = QueryDef(
    "q11_join_shuffle",
    """SELECT o_orderstatus, COUNT(*) AS n_lines,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders").hint("merge")
      .join(Tables.table(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec("l_quantity")).cast("decimal(38,2)").cast("double").as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  // --- q12: 6-table star join, revenue by nation (TPC-H Q5 shape) --------
  // Scale notes: region/nation/customer/supplier are dimensions — Catalyst
  // auto-broadcasts them (≪10 MB); only orders⋈lineitem shuffles, on the
  // join key. Revenue math is exact decimal, so partial aggregation
  // (map-side combine) commutes deterministically.
  private val q12 = QueryDef(
    "q12_join_multiway",
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir,
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region"))
    t("customer")
      .join(t("orders"), col("c_custkey") === col("o_custkey"))
      .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("decimal(38,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- q13: left-semi join (EXISTS) ---------------------------------------
  private val q13 = QueryDef(
    "q13_join_semi",
    // EXISTS over URGENT orders only: every customer has SOME order (q14's
    // comment), so an unrestricted semi join would keep everyone and be
    // indistinguishable from a plain scan — restricted, it genuinely
    // excludes customers (25 of the first 200 measured, the q15 complement).
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "customer")
      .join(Tables.table(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey").limit(200)
  }

  // --- q14: left-anti join (NOT EXISTS) -----------------------------------
  // Every customer has *some* order, so the anti side is date-restricted to
  // keep the result nonempty (14 rows at sf0.001, 135 at sf0.01).
  private val q14 = QueryDef(
    "q14_join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "customer")
      .join(
        Tables.table(s, dir, "orders")
          .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey").limit(200)
  }

  // --- q15: left outer join + null-side handling --------------------------
  private val q15 = QueryDef(
    "q15_join_outer",
    // The right side is restricted to URGENT orders: EVERY customer has
    // some order in this data, so an unrestricted left join would be
    // indistinguishable from an inner join and the null-extension path
    // would never fire — with the restriction, 25 of the first 200
    // customers have no match (r04, measured) and n_orders=0 rows prove
    // the outer semantics.
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
      |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      |  ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "customer")
      .join(Tables.table(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec("o_totalprice")), lit(0)).cast("decimal(38,2)")
          .cast("double").as("total_spend"))
      .orderBy("c_custkey").limit(200)
  }

  // --- q16: equi join + range residual (theta) ----------------------------
  // The equi key carries the shuffle; the range predicate is a post-join
  // filter — the scalable shape for theta joins at 100 TB.
  private val q16 = QueryDef(
    "q16_join_range_theta",
    """SELECT o_orderstatus, COUNT(*) AS n_late,
      |  MAX(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS max_lag_days
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .join(Tables.table(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_late"),
        max(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))).as("max_lag_days"))
      .orderBy("o_orderstatus")
  }

  // --- q17: as-of join ----------------------------------------------------
  // For each purchase, the latest strictly-earlier view by the same user.
  // Spark has no native ASOF; the scalable formulation is one shuffle on
  // user_id + a range-frame window over µs longs ((-1) excludes ties, i.e.
  // strict <) — never a pairwise self-join. Oracle uses a correlated scalar
  // subquery with identical semantics.
  private val q17 = QueryDef(
    "q17_join_asof",
    """SELECT p.event_id, p.user_id,
      |  (SELECT MAX(v.ts) FROM events v
      |   WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts) AS view_ts
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id LIMIT 300""".stripMargin) { (s, dir) =>
    val events = Tables.table(s, dir, "events")
    graft.operators.AsofJoin.left(
      left = events.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts"),
      right = events.where(col("event_type") === "view"),
      on = "user_id", leftTs = "ts", rightTs = "ts",
      rightPayload = Map("ts" -> "view_ts"))
      .select("event_id", "user_id", "view_ts")
      .orderBy("event_id").limit(300)
  }

  // --- q18: TPC-H Q1-shape hash aggregation ------------------------------
  // Partial+final HashAggregate; exact decimal sums; avg expressed as an
  // exact decimal division (sum/count) rather than AVG-on-double so both
  // engines agree bit-for-bit.
  private val q18 = QueryDef(
    "q18_agg_hash",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(38,6)) AS DOUBLE) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("decimal(38,2)").cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("decimal(38,2)").cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("decimal(38,4)").cast("double").as("sum_disc_price"),
        (sum(dec("l_quantity")) / count(lit(1))).cast("decimal(38,6)")
          .cast("double").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // --- q19: exact COUNT(DISTINCT) per group -------------------------------
  // Expand + two-phase aggregate; the exact twin of q23's HLL sketch.
  private val q19 = QueryDef(
    "q19_agg_distinct",
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  // --- q20: ROLLUP with GROUPING() disambiguation -------------------------
  // Group keys are COALESCEd (data has no real NULLs) so the result carries
  // no NULL order-by keys — sidesteps the NULLS FIRST/LAST engine split.
  private val q20 = QueryDef(
    "q20_agg_rollup",
    """SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
      |  CAST(GROUPING(lang) AS INTEGER) AS g_lang, CAST(GROUPING(source) AS INTEGER) AS g_source,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY ROLLUP(lang, source)
      |ORDER BY g_lang, g_source, lang, source""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "documents")
      .rollup("lang", "source")
      .agg(grouping("lang").cast("int").as("g_lang"),
        grouping("source").cast("int").as("g_source"),
        count(lit(1)).as("n_docs"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("g_lang"), col("g_source"), col("n_docs"))
      .orderBy("g_lang", "g_source", "lang", "source")
  }

  // --- q21: CUBE over (event_type, day) -----------------------------------
  private val q21 = QueryDef(
    "q21_agg_cube",
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      |  COALESCE(CAST(CAST(DATE_TRUNC('day', ts) AS DATE) AS VARCHAR), 'ALL') AS day,
      |  COUNT(*) AS n
      |FROM events GROUP BY CUBE(event_type, CAST(DATE_TRUNC('day', ts) AS DATE))
      |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "events")
      .withColumn("day", date_trunc("day", col("ts")).cast("date").cast("string"))
      .cube("event_type", "day")
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"), col("n"))
      .orderBy("event_type", "day")
  }

  // --- q22: explicit GROUPING SETS ----------------------------------------
  // Same ANSI text runs in both engines; Spark side goes through spark.sql
  // to exercise the SQL entry point the reference demonstrated.
  private val q22Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin
  private val q22 = QueryDef("q22_grouping_sets", q22Sql) { (s, dir) =>
    Tables.load(s, dir, Seq("orders"))
    s.sql(q22Sql)
  }

  // --- q23: HLL approximate distinct (no oracle: sketch is engine-specific)
  private val q23 = QueryDef.noOracle("q23_agg_approx_distinct") { (s, dir) =>
    Tables.table(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  // --- q24: custom typed UDAF — second-largest order total per status -----
  // Aggregator[IN,BUF,OUT] with an O(1) mergeable buffer; multiset
  // semantics match the oracle's row_number()=2 (single-row groups drop).
  private val q24 = QueryDef(
    "q24_udaf_second_max",
    """SELECT o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS second_total
      |FROM (SELECT o_orderstatus, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn = 2 ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val secondMax = udaf(graft.engine.expr.SecondMaxAgg)
    Tables.table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(secondMax(col("o_totalprice")).as("sm"), count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(col("o_orderstatus"),
        col("sm").cast("decimal(18,2)").cast("double").as("second_total"))
      .orderBy("o_orderstatus")
  }

  // --- q25: window ranking: top-3 orders per status -----------------------
  private val q25 = QueryDef(
    "q25_window_rank",
    """SELECT * FROM (
      |  SELECT o_orderstatus, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.table(s, dir, "orders")
      .select(col("o_orderstatus"), row_number().over(w).as("rn"),
        col("o_orderkey"), dec("o_totalprice").cast("double").as("totalprice"))
      .where(col("rn") <= 3)
      .orderBy("o_orderstatus", "rn")
  }

  // --- q26: lag — days between consecutive orders per customer ------------
  private val q26 = QueryDef(
    "q26_window_lag",
    """SELECT o_custkey, o_orderkey,
      |  DATE_DIFF('day',
      |    CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS gap_days
      |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 300""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).as("gap_days"))
      .orderBy("o_custkey", "o_orderkey").limit(300)
  }

  // --- q27: running-sum frame ---------------------------------------------
  // Window order includes every projected column: remaining ties are fully
  // identical rows, so any tie order yields the same (row, running) pairs.
  private val q27 = QueryDef(
    "q27_window_frame",
    """SELECT l_partkey, l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_partkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS run_qty
      |FROM lineitem WHERE l_partkey < 40
      |ORDER BY l_partkey, ship_date, l_orderkey, l_linenumber, run_qty
      |LIMIT 300""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("l_partkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.table(s, dir, "lineitem")
      .where(col("l_partkey") < 40)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_date"),
        sum(dec("l_quantity")).over(w).cast("decimal(38,2)").cast("double").as("run_qty"))
      .orderBy("l_partkey", "ship_date", "l_orderkey", "l_linenumber", "run_qty")
      .limit(300)
  }

  // --- q28: global top-k (TakeOrderedAndProject) --------------------------
  // orderBy+limit compiles to per-partition top-k + driver merge of k rows —
  // the only global sort shape that's O(k) at the driver regardless of scale.
  private val q28 = QueryDef(
    "q28_topk_global",
    """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        dec("o_totalprice").cast("double").as("totalprice"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  // --- q29: set operations, tagged ----------------------------------------
  // Spark union() is UNION ALL; intersect/except are DISTINCT set semantics —
  // matching the SQL operators exactly. The b side is restricted to
  // nationkey < 20 (r04): both tables cover the SAME 25 keys, so the
  // unrestricted EXCEPT was always empty — a broken EXCEPT returning
  // nothing would have passed; restricted, EXCEPT emits 5 rows, INTERSECT
  // 20, and all three branches are non-trivially distinct.
  private val q29 = QueryDef(
    "q29_set_ops",
    """WITH a AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     b AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_nationkey < 20)
      |SELECT 'except' AS tag, nationkey FROM (SELECT nationkey FROM a EXCEPT SELECT nationkey FROM b)
      |UNION ALL
      |SELECT 'intersect' AS tag, nationkey FROM (SELECT nationkey FROM a INTERSECT SELECT nationkey FROM b)
      |UNION ALL
      |SELECT 'union_all' AS tag, nationkey FROM (SELECT nationkey FROM a UNION ALL SELECT nationkey FROM b)
      |ORDER BY tag, nationkey""".stripMargin) { (s, dir) =>
    val a = Tables.table(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val b = Tables.table(s, dir, "supplier").where(col("s_nationkey") < 20)
      .select(col("s_nationkey").as("nationkey")).distinct()
    a.except(b).select(lit("except").as("tag"), col("nationkey"))
      .unionByName(a.intersect(b).select(lit("intersect").as("tag"), col("nationkey")))
      .unionByName(a.union(b).select(lit("union_all").as("tag"), col("nationkey")))
      .orderBy("tag", "nationkey")
  }

  // --- q54: top-k per group via the custom TopKPerGroup operator ----------
  // Full custom-plan stack (LogicalPlan + Strategy + bounded-heap exec,
  // graft.plans.TopKPerGroup): O(n log k) per group instead of the window
  // formulation's full per-group sort. Same oracle as the row_number()
  // formulation — the custom operator must be semantically identical.
  private val q54 = QueryDef(
    "q54_topk_custom_plan",
    """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, totalprice DESC, o_orderkey
      |LIMIT 300""".stripMargin) { (s, dir) =>
    val top = graft.plans.TopKPerGroup(
      Tables.table(s, dir, "orders"),
      groupCols = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k = 3)
    top.select(col("o_custkey"), col("o_orderkey"),
        dec("o_totalprice").cast("double").as("totalprice"))
      .orderBy(col("o_custkey"), col("totalprice").desc, col("o_orderkey"))
      .limit(300)
  }

  // --- q55: skew-safe two-phase (salted) aggregation ----------------------
  // events has only ~15 distinct user_ids — a worst-case skew key. The
  // salted shape shuffles on (user_id, salt) so each reducer handles 1/16th
  // of a hot key, then a second tiny shuffle merges the partials. Decimal
  // partials merge exactly, so result == the plain GROUP BY oracle.
  private val q55 = QueryDef(
    "q55_skew_salted_agg",
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec("value")).as("psum"))
      .groupBy("user_id")
      .agg(sum(col("pn")).as("n_events"),
        sum(col("psum")).cast("decimal(38,2)").cast("double").as("sum_value"))
      .orderBy("user_id")
  }

  // --- q57: TPC-H Q3 shape (shipping priority, adapted to the schema) -----
  private val q57 = QueryDef(
    "q57_tpch_q3_shape",
    """SELECT l_orderkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, odate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .join(Tables.table(s, dir, "orders")
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"),
        col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("decimal(38,4)").cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "odate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
  }

  // --- q58: exact percentiles (sort-based aggregate) ----------------------
  // Both engines interpolate exactly ((1-f)*lo + f*hi over the sorted
  // group); rounding to 2dp absorbs last-ulp differences.
  private val q58 = QueryDef(
    "q58_agg_percentile",
    """SELECT o_orderstatus,
      |  CAST(CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS DECIMAL(18,2)) AS DOUBLE) AS p50,
      |  CAST(CAST(ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2) AS DECIMAL(18,2)) AS DOUBLE) AS p90
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).cast("decimal(18,2)")
          .cast("double").as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).cast("decimal(18,2)")
          .cast("double").as("p90"))
      .orderBy("o_orderstatus")
  }

  // --- q59: pivot (conditional aggregation with an explicit value list) ---
  private val q59 = QueryDef(
    "q59_pivot",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")
  }

  // --- q60: consistent (hash-based) 10% sample ----------------------------
  // Reproducible sampling by KEY (operators/Sampling): admission is a pure
  // function of (l_orderkey, l_linenumber, l_partkey), so the sample is
  // identical across runs, engines, and cluster layouts, thresholds nest
  // (5% ⊂ 10%), and the filter is map-only — pushed to the scan like any
  // predicate. The portable arithmetic means the oracle verifies the EXACT
  // sampled set (r04: replaces the engine-RNG `sample(seed)`, whose output
  // is partitioning-dependent and was oracle-free by necessity; the
  // built-in stays available for key-independent statistical sampling).
  private val q60 = QueryDef(
    "q60_sample",
    """SELECT l_returnflag, COUNT(*) AS n_sampled FROM lineitem
      |WHERE (((((l_orderkey % 1000000007) * 131 + (l_linenumber % 1000000007)) % 1000000007) * 131
      |        + (l_partkey % 1000000007)) % 1000000007)
      |      % 1000003 * 2654435761 % 1000003 % 100 < 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "lineitem")
      .where(graft.operators.Sampling.admitted(10,
        col("l_orderkey"), col("l_linenumber"), col("l_partkey")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("l_returnflag")
  }

  // --- q64: MERGE/upsert (SCD type-1) via full outer join -----------------
  // Vanilla Spark has no MERGE INTO against parquet; the scalable
  // equivalent is one full outer join on the key: updates overwrite,
  // unmatched changes insert, unmatched snapshot rows keep. Shuffles once
  // on the merge key; at 100 TB the snapshot side would be bucketed on the
  // key (q52) making re-merges shuffle-free.
  private val q64 = QueryDef(
    "q64_merge_upsert",
    """WITH changes AS (
      |  SELECT o_custkey AS custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS new_bal
      |  FROM orders WHERE o_custkey % 37 = 0 GROUP BY o_custkey
      |  UNION ALL
      |  SELECT 900000 + r_regionkey, CAST(0 AS DECIMAL(18,2)) FROM region)
      |SELECT COALESCE(s.c_custkey, c.custkey) AS c_custkey,
      |  CAST(COALESCE(c.new_bal, CAST(s.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal,
      |  CASE WHEN s.c_custkey IS NULL THEN 'insert'
      |       WHEN c.custkey IS NULL THEN 'keep' ELSE 'update' END AS op
      |FROM customer s FULL OUTER JOIN changes c ON s.c_custkey = c.custkey
      |ORDER BY CASE op WHEN 'insert' THEN 0 WHEN 'update' THEN 1 ELSE 2 END,
      |  c_custkey LIMIT 300""".stripMargin) { (s, dir) =>
    val changes = Tables.table(s, dir, "orders")
      .where(col("o_custkey") % 37 === 0)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(dec("o_totalprice")).cast("decimal(18,2)").as("new_bal"))
      .unionByName(Tables.table(s, dir, "region")
        .select((lit(900000) + col("r_regionkey")).cast("bigint").as("custkey"),
          lit(0).cast("decimal(18,2)").as("new_bal")))
    Tables.table(s, dir, "customer")
      .join(changes, col("c_custkey") === col("custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("custkey")).as("c_custkey"),
        coalesce(col("new_bal"), dec("c_acctbal")).cast("double").as("acctbal"),
        when(col("c_custkey").isNull, "insert")
          .when(col("custkey").isNull, "keep").otherwise("update").as("op"))
      // order inserts, then updates, then keeps: ascending c_custkey alone
      // would truncate the 900000+ insert keys out of the LIMIT — the
      // insert path would run but never be VISIBLE to the oracle compare;
      // plain op order would truncate the updates instead (r04). This
      // ordering keeps all three MERGE outcomes inside the compared rows.
      .orderBy(when(col("op") === "insert", 0)
        .when(col("op") === "update", 1).otherwise(2), col("c_custkey"))
      .limit(300)
  }

  // --- q65: ranking-function family: ntile / percent_rank / cume_dist ----
  // percent_rank and cume_dist are exact small-integer ratios computed as
  // identical double divisions in both engines → bit-equal without rounding.
  private val q65 = QueryDef(
    "q65_window_ranks",
    """SELECT o_orderkey, o_orderstatus,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey LIMIT 300""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    Tables.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey").limit(300)
  }

  // --- q67: schema-driven JSON parsing (from_json → struct) ---------------
  // The typed counterpart of q08's get_json_object: props parses once into
  // a struct whose fields are then ordinary columns.
  private val q67 = QueryDef(
    "q67_json_struct",
    """SELECT event_type,
      |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "events")
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
      .groupBy("event_type")
      .agg(sum(when(col("p.k") > 50, 1).otherwise(0)).as("n_high"),
        min(col("p.k")).as("min_k"), max(col("p.k")).as("max_k"))
      .orderBy("event_type")
  }

  // --- q68: higher-order array predicates: exists / forall / filter -------
  private val q68 = QueryDef(
    "q68_array_predicates",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      |SELECT
      |  CAST(SUM(CASE WHEN len(list_filter(l, x -> x = 'the')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_has_the,
      |  CAST(SUM(CASE WHEN len(list_filter(l, x -> length(x) < 2)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_long,
      |  CAST(SUM(len(list_filter(l, x -> length(x) >= 6))) AS BIGINT) AS n_long_tokens
      |FROM t""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "documents")
      .withColumn("l", split(col("text"), " "))
      .agg(
        sum(when(exists(col("l"), x => x === "the"), 1).otherwise(0)).as("n_has_the"),
        sum(when(forall(col("l"), x => length(x) >= 2), 1).otherwise(0)).as("n_all_long"),
        sum(size(filter(col("l"), x => length(x) >= 6))).as("n_long_tokens"))
  }

  // --- q71: consistent stratified sample (per-stratum percentages) --------
  // The balanced-subset builder for training-data curation, on the same
  // consistent-by-key admission as q60 (operators/Sampling): each lang
  // keeps its own percentage of docs, chosen by the portable doc_id hash —
  // reproducible, auditable (the oracle verifies the exact per-stratum
  // sets), and map-only. r04: replaces `stat.sampleBy(seed)` (engine RNG,
  // oracle-free by necessity); the built-in remains for key-independent
  // statistical sampling.
  private val q71 = QueryDef(
    "q71_stratified_sample",
    """SELECT lang, COUNT(*) AS n_sampled FROM documents
      |WHERE doc_id % 1000000007 % 1000003 * 2654435761 % 1000003 % 100 <
      |  CASE lang WHEN 'de' THEN 50 WHEN 'en' THEN 30 WHEN 'es' THEN 20
      |            WHEN 'fr' THEN 10 WHEN 'zh' THEN 5 ELSE 0 END
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "documents")
      .where(graft.operators.Sampling.stratifiedAdmitted(col("lang"),
        Map("de" -> 50, "en" -> 30, "es" -> 20, "fr" -> 10, "zh" -> 5),
        col("doc_id")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")
  }

  // --- q69: approximate percentile (sketch twin of q58, like q23↔q19) -----
  // t-digest-style sketch state is O(accuracy), not O(group) — the 100 TB
  // choice when exact sort-based percentiles are too expensive. Sketch
  // results are engine-specific → rows-only check; q58 is the exact twin.
  // Output is flattened to scalar p50/p90 columns: an array-typed output
  // column crashes the driver comparator's pandas sort (r01 q69 err).
  private val q69 = QueryDef.noOracle("q69_agg_approx_percentile") { (s, dir) =>
    Tables.table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)").as("approx_p"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        col("approx_p").getItem(0).as("p50_approx"),
        col("approx_p").getItem(1).as("p90_approx"), col("n"))
      .orderBy("o_orderstatus")
  }

  // --- q81: UNPIVOT (melt) — the inverse of q59's pivot --------------------
  // Wide per-user event counts back to long (user_id, event_type, n) rows,
  // zeros retained — the relational surface member q59 was missing its
  // inverse of. Spark's Dataset.unpivot emits one row per (id, column);
  // the oracle reconstructs the same dense grid with a cross join against
  // the fixed value list.
  private val q81 = QueryDef(
    "q81_unpivot",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |t AS (SELECT * FROM (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')) AS v(event_type)),
      |c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
      |SELECT u.user_id, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      |FROM u CROSS JOIN t
      |LEFT JOIN c ON u.user_id = c.user_id AND t.event_type = c.event_type
      |ORDER BY u.user_id, t.event_type LIMIT 500""".stripMargin) { (s, dir) =>
    val kinds = Seq("click", "error", "purchase", "signup", "view")
    Tables.table(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", kinds)
      .count()
      .na.fill(0L)
      .unpivot(Array(col("user_id")), kinds.map(col).toArray, "event_type", "n")
      .orderBy("user_id", "event_type").limit(500)
  }

  // --- q83: binned value distribution (fixed-width histogram) --------------
  // The profiling shape: fixed-width buckets via floor arithmetic (both
  // engines do the identical double divide + floor), top bucket clamped.
  private val q83 = QueryDef(
    "q83_histogram",
    """SELECT CAST(LEAST(FLOOR(o_totalprice / 60000), 9) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS lo,
      |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS hi
      |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .groupBy(least(floor(col("o_totalprice") / 60000), lit(9))
        .cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).cast("decimal(18,2)").cast("double").as("lo"),
        max(col("o_totalprice")).cast("decimal(18,2)").cast("double").as("hi"))
      .orderBy("bucket")
  }

  // --- q84: ordered string aggregation (group-concat) ----------------------
  // The string-aggregation surface: per group, the first 5 keys in sorted
  // order joined to one string. Sorting inside the aggregate makes the
  // result order-independent (a bare collect_list/string_agg is
  // partition-order-dependent — never emit one unsorted).
  private val q84 = QueryDef(
    "q84_string_agg",
    """SELECT o_orderpriority,
      |  array_to_string(list_sort(list(o_orderkey))[1:5], ',') AS first_keys,
      |  COUNT(*) AS n
      |FROM orders WHERE o_orderkey < 1000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "orders")
      .where(col("o_orderkey") < 1000)
      .groupBy("o_orderpriority")
      .agg(
        concat_ws(",", slice(sort_array(collect_list(col("o_orderkey"))), 1, 5))
          .as("first_keys"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  // --- q95: higher-order array functions (lambda surface) -----------------
  // The codegen-friendly alternative to UDFs for per-row collection logic:
  // filter / exists / aggregate / transform over token arrays, all inside
  // the scan's projection — map-only, no shuffle until the final sort.
  // DuckDB mirrors each with list_filter / list_sort / list_transform +
  // list_sum (cast BIGINT: list_sum arrives as HUGEINT in pandas).
  private val q95 = QueryDef(
    "q95_higher_order_funcs",
    """SELECT p_partkey,
      |  len(list_filter(string_split(p_name, ' '), t -> length(t) > 5)) AS n_long,
      |  len(string_split(p_name, ' ')) > 4 AS many_tokens,
      |  CAST(list_sum(list_transform(string_split(p_name, ' '), t -> length(t))) AS BIGINT) AS total_len,
      |  list_sort(string_split(p_name, ' '))[1] AS first_token
      |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "part")
      .withColumn("l", split(col("p_name"), " "))
      .select(col("p_partkey"),
        size(filter(col("l"), t => length(t) > 5)).as("n_long"),
        (size(col("l")) > 4).as("many_tokens"),
        aggregate(col("l"), lit(0L), (acc, t) => acc + length(t))
          .as("total_len"),
        element_at(array_sort(col("l")), 1).as("first_token"))
      .orderBy("p_partkey").limit(500)
  }

  // --- q96: MapType function family ---------------------------------------
  // The map surface (map_from_arrays / map_filter / transform_values /
  // map_values / element_at): per-row token→length maps, filtered and
  // re-aggregated to scalars. DuckDB has no equivalent map pipeline — the
  // oracle recomputes the same SCALARS from the distinct-token list, which
  // is exactly what makes the map results verifiable. Map keys must be
  // unique: tokens are array_distinct'd first. Map-only until the sort.
  private val q96 = QueryDef(
    "q96_map_funcs",
    """WITH t AS (SELECT p_partkey, list_distinct(string_split(p_name, ' ')) AS ks FROM part)
      |SELECT p_partkey,
      |  len(list_filter(ks, k -> length(k) > 5)) AS n_long_vals,
      |  CAST(2 * list_sum(list_transform(ks, k -> length(k))) AS BIGINT) AS sum_doubled,
      |  length(list_sort(ks)[1]) AS first_key_len
      |FROM t ORDER BY p_partkey LIMIT 500""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "part")
      .withColumn("ks", array_distinct(split(col("p_name"), " ")))
      .withColumn("m", map_from_arrays(col("ks"), transform(col("ks"), k => length(k))))
      .select(col("p_partkey"),
        size(map_filter(col("m"), (_, v) => v > 5)).as("n_long_vals"),
        aggregate(map_values(transform_values(col("m"), (_, v) => v * 2)),
          lit(0L), (acc, v) => acc + v).as("sum_doubled"),
        element_at(col("m"), element_at(array_sort(col("ks")), 1)).as("first_key_len"))
      .orderBy("p_partkey").limit(500)
  }

  def defs: Seq[QueryDef] = Seq(
    q01, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17,
    q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q54, q55, q57, q58, q59, q60,
    q64, q65, q67, q68, q69, q71, q81, q83, q84, q95, q96)
}
