package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.expr.DotProduct

/**
 * Embedding-similarity operators (library API). All dot products go
 * through the native codegen [[DotProduct]] expression; every variant
 * bounds its pairwise stage (probe set, block, or bucket) — never N×N
 * over the corpus.
 */
object Similarity {

  /** vectors normalized with an L2-norm column attached; `vecCol` must be
    * array<float> or array<double>. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      extra: Seq[String] = Nil): DataFrame = {
    val base = df.select((Seq(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__e")) ++ extra.map(col)): _*)
    DotProduct.register(df.sparkSession)
    base.withColumn("__nrm", expr("sqrt(dot_product(__e, __e))"))
  }

  /** Rounded decimal cosine between the pre-normalized internal columns. */
  private def cosine(ea: Column, eb: Column, na: Column, nb: Column): Column =
    round(DotProduct.dot(ea, eb) / (na * nb), 4).cast("decimal(7,4)")

  /** Exact top-k cosine neighbors for each probe row (brute force over the
    * corpus, broadcast probes — the baseline ANN answers are judged
    * against). Output: (probe_id, rn, neighbor_id, sim). */
  def cosineTopK(vectors: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val n = withNorm(vectors, idCol, vecCol)
    val p = withNorm(probes, idCol, vecCol)
      .select(col("__id").as("__pid"), col("__e").as("__pe"), col("__nrm").as("__pn"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    n.crossJoin(broadcast(p))
      .where(col("__id") =!= col("__pid"))
      .select(col("__pid").as("probe_id"), col("__id").as("neighbor_id"),
        cosine(col("__pe"), col("__e"), col("__pn"), col("__nrm")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("probe_id", "rn", "neighbor_id", "sim")
  }

  /** Approximate top-k via signed-random-projection (SRP) LSH.
    *
    * `tables × bitsPerTable` hyperplanes are derived DETERMINISTICALLY from
    * xxhash64(plane, dim) (sign of a dot is scale-invariant, so the
    * pseudo-random values need no normalization). Every vector hashes to
    * one bucket per table (the sign-bit word of its dots); probes search
    * only vectors sharing ≥1 bucket, then exact-cosine re-rank. At scale:
    * corpus bucketing is one broadcast join + one shuffle, search touches
    * O(candidates) not O(corpus).
    */
  def srpTopK(vectors: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 8, bitsPerTable: Int = 6): DataFrame = {
    val spark = vectors.sparkSession
    DotProduct.register(spark)
    val nPlanes = tables * bitsPerTable
    val dim = 64
    val planes = spark.range(nPlanes).select(col("id").as("plane"),
      // double literals (500.5D): plain 500.5 parses as DECIMAL and would
      // silently turn the plane arrays into array<decimal>
      expr(s"transform(sequence(0, ${dim - 1}), d -> cast(pmod(xxhash64(id, d), 1001) AS DOUBLE) / 500.5D - 1.0D)").as("h"))
    def buckets(df: DataFrame): DataFrame = {
      val withBits = withNorm(df, idCol, vecCol)
        .crossJoin(broadcast(planes))
        .select(col("__id"), col("__e"), col("__nrm"), col("plane"),
          (DotProduct.dot(col("__e"), col("h")) >= 0).cast("long").as("bit"))
      val aggs = Seq(first(col("__e")).as("__e"), first(col("__nrm")).as("__nrm")) ++
        (0 until tables).map { t =>
          sum(when(expr(s"plane div $bitsPerTable") === t,
            expr(s"shiftleft(bit, cast(plane % $bitsPerTable AS INT))"))
            .otherwise(0L)).as(s"bk$t")
        }
      withBits
        .groupBy("__id")
        .agg(aggs.head, aggs.tail: _*)
        .select(col("__id"), col("__e"), col("__nrm"),
          posexplode(array((0 until tables).map(t => col(s"bk$t")): _*))
            .as(Seq("table", "bucket")))
    }
    val corpus = buckets(vectors)
    val probeB = buckets(probes).select(col("__id").as("__pid"),
      col("__e").as("__pe"), col("__nrm").as("__pn"), col("table"), col("bucket"))
    val w = Window.partitionBy("probe_id").orderBy(col("sim").desc, col("neighbor_id"))
    corpus.join(probeB, Seq("table", "bucket"))
      .where(col("__id") =!= col("__pid"))
      .select(col("__pid").as("probe_id"), col("__id").as("neighbor_id"),
        cosine(col("__pe"), col("__e"), col("__pn"), col("__nrm")).as("sim"))
      .distinct() // a pair may collide in several tables
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("probe_id", "rn", "neighbor_id", "sim")
  }

  /** Pairs within a block whose rounded cosine meets `threshold` —
    * quadratic only inside each block (LSH/label blocking pattern).
    * Output: (block, doc_a, doc_b, sim). */
  def blockedPairs(vectors: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val n = withNorm(vectors, idCol, vecCol, Seq(blockCol))
    val a = n.select(col(blockCol).as("__block"), col("__id").as("doc_a"),
      col("__e").as("__ea"), col("__nrm").as("__na"))
    val b = n.select(col(blockCol).as("__block_b"), col("__id").as("doc_b"),
      col("__e").as("__eb"), col("__nrm").as("__nb"))
    a.join(b, col("__block") === col("__block_b") && col("doc_a") < col("doc_b"))
      .withColumn("sim", cosine(col("__ea"), col("__eb"), col("__na"), col("__nb")))
      .where(col("sim") >= threshold)
      .select(col("__block").as(blockCol), col("doc_a"), col("doc_b"), col("sim"))
  }
}
