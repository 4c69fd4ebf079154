package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.expr.DotProduct

/**
 * Embedding clustering (library API): nearest-centroid assignment and
 * Lloyd's k-means — the curation primitives behind cluster-balanced
 * sampling and topic-level dedup of training corpora.
 *
 * Determinism rules (the repo-wide float policy):
 *   - distances are compared as INTEGER micros (`floor(d2 × 1e6)` of the
 *     squared L2), with the centroid id as tiebreak — no raw-double
 *     ordering anywhere;
 *   - centroid recomputation quantizes components to integer micros before
 *     summing (the q97 pattern), so the means are partition-order-free and
 *     a rerun on any partitioning reproduces the same centroids bit-for-bit.
 *
 * Scale shape: centroids are always broadcast (k × dim values); assignment
 * is a broadcast cross join producing k rows per vector that collapse
 * map-side in the groupBy's partial aggregation, so the shuffle carries one
 * row per vector. Centroid recomputation is one (cluster, dim) aggregation.
 * Nothing is ever collected to the driver.
 */
object Clustering {

  /** Assign each vector to its nearest centroid by squared L2.
    *
    * @param vectors   (idCol, vecCol: array<float|double>)
    * @param centroids (cid: long, cv: array<double>) — small, broadcast
    * @return (idCol, cluster, d2_micros) — d2_micros = floor(d2 × 1e6)
    */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val v = vectors.select(col(idCol), col(vecCol).cast("array<double>").as("__ev"))
    // d2 = v·v − 2 v·c + c·c: three codegen dot products, identical
    // association order on every engine.
    val d2 = DotProduct.dot(col("__ev"), col("__ev")) -
      lit(2d) * DotProduct.dot(col("__ev"), col("cv")) +
      DotProduct.dot(col("cv"), col("cv"))
    v.crossJoin(broadcast(centroids))
      .select(col(idCol), col("cid"), floor(d2 * lit(1000000d)).as("__d2m"))
      .groupBy(idCol)
      .agg(min_by(col("cid"), struct(col("__d2m"), col("cid"))).as("cluster"),
        min(col("__d2m")).as("d2_micros"))
  }

  /** Lloyd's k-means. Init = the k vectors with the smallest ids (data-
    * dependent, deterministic). Returns the final (id, cluster, d2_micros)
    * assignment; `iters` fixed rather than convergence-tested so the plan
    * depth is bounded and known (callers wanting convergence re-invoke). */
  def kmeans(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val v = vectors.select(col(idCol), col(vecCol).cast("array<double>").as("__ev"))
    var centroids = v.orderBy(col(idCol)).limit(k)
      .select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col(idCol)))
          .cast("long").as("cid"),
        col("__ev").as("cv"))
    var assigned: DataFrame = null
    for (i <- 0 until iters) {
      assigned = assign(v, idCol, "__ev", centroids)
      if (i < iters - 1) {
        // mean per (cluster, dim) over micro-quantized components: BIGINT
        // sums are associative+commutative, so the new centroids are
        // independent of partitioning; localCheckpoint truncates the
        // per-iteration lineage (the connectedComponents lesson).
        centroids = v.join(assigned.select(col(idCol), col("cluster")), idCol)
          .select(col("cluster"),
            posexplode(expr("transform(__ev, x -> cast(floor(x * 1000000d) AS BIGINT))"))
              .as(Seq("dim", "micros")))
          .groupBy("cluster", "dim")
          .agg(sum("micros").as("s"), count(lit(1)).as("n"))
          .groupBy(col("cluster").as("cid"))
          .agg(array_sort(collect_list(struct(col("dim"), col("s"), col("n")))).as("a"))
          .select(col("cid"),
            expr("transform(a, e -> (cast(e.s AS DOUBLE) / e.n) / 1000000d)").as("cv"))
          .localCheckpoint(false)
      }
    }
    assigned
  }
}
