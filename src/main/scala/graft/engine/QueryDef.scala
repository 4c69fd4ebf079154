package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One declared operator: a Spark-side builder plus (optionally) the
 * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
 * `oracle = None` is reserved for ops whose result is engine-specific
 * (approx sketches, MinHash, true-streaming runtime) — the driver then
 * records a weaker rows-only check.
 *
 * Determinism contract for every query (SURVEY §2): total-order ORDER BY
 * with unique tiebreak; no raw double aggregates (cast to DECIMAL first);
 * no raw timestamps in output (strings/ints instead); LIMIT where unbounded.
 */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Helper keeping name/builder/oracle adjacent at the definition site. */
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
