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
 */
object Relational {

  /** Money/measure columns arrive as DOUBLE (2-dp values); cast to exact
    * DECIMAL before arithmetic so aggregates are partition-order-independent
    * and identical across engines. */
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

  // --- q12: 6-table star join, revenue by nation (TPC-H Q5 shape) --------
  // Scale notes: region/nation/customer/supplier are dimensions — Catalyst
  // auto-broadcasts them (≪10 MB); only orders⋈lineitem shuffles, on the
  // join key. Revenue math is exact decimal, so partial aggregation
  // (map-side combine) commutes deterministically.
  private val q12 = QueryDef(
    "q12_join_multiway",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir)
    t("customer")
      .join(t("orders"), col("c_custkey") === col("o_custkey"))
      .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("decimal(38,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- q18: TPC-H Q1-shape hash aggregation ------------------------------
  // Partial+final HashAggregate; exact decimal sums; avg expressed as an
  // exact decimal division (sum/count) rather than AVG-on-double so both
  // engines agree bit-for-bit.
  private val q18 = QueryDef(
    "q18_agg_hash",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(38,6)) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("decimal(38,2)").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("decimal(38,2)").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("decimal(38,4)").as("sum_disc_price"),
        (sum(dec("l_quantity")) / count(lit(1))).cast("decimal(38,6)").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def defs: Seq[QueryDef] = Seq(q01, q12, q18)
}
