package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Single source of truth for table access (SURVEY §7.0).
 *
 * The reference pipeline (AndreSchumacher/avro-parquet-spark-example)
 * registers Parquet files as Spark SQL tables and queries them; this loader
 * is the Spark-4.x equivalent: `spark.read.parquet` + temp views, with one
 * environment-specific normalization (events.ts is TIMESTAMP(NANOS), which
 * Spark 4.1.2's vectorized Parquet reader rejects unless
 * `spark.sql.legacy.parquet.nanosAsLong=true`; the raw longs are then
 * converted to microsecond timestamps — lossless here, no row has
 * sub-microsecond components).
 *
 * Scale note (100 TB): everything below is a metadata operation — no data
 * is materialized on the driver. On a real cluster the same code reads
 * partitioned directories; pushdown/pruning happen at the Parquet scan.
 */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = relational ++ Seq("events", "documents", "embeddings")

  /** Read one table (with the events ts normalization applied). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // ts arrives as nanos-since-epoch LongType under the legacy flag;
      // integer-divide (`div`, NOT `/` — double division loses precision
      // above 2^53, and ns-epoch values are ~1.7e18) to micros and rebuild
      // a proper TimestampType column.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /**
   * Load the named tables (default: every table) and (re-)register `<name>`
   * temp views so queries can be expressed either via the DataFrame DSL or
   * `spark.sql`. Query builders should pass exactly the tables they touch —
   * per-table load is a metadata op, but 10 of them add measurable constant
   * cost to every bench invocation.
   */
  def load(spark: SparkSession, sfDir: String,
           names: Seq[String] = all): Map[String, DataFrame] = {
    val dfs = names.map(n => n -> table(spark, sfDir, n)).toMap
    dfs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    dfs
  }
}
