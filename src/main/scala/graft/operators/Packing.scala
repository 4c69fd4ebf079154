package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Sequence packing (library API): concatenate documents in a deterministic
 * order and chunk the token stream into fixed-budget training sequences —
 * the "concat-and-chunk" packing every LLM pretraining pipeline runs to
 * turn variable-length documents into fixed-length samples.
 *
 * Scale shape: a single GLOBAL token order would serialize the cumulative
 * sum onto one partition, so packing is sharded — each document lands in a
 * shard by portable integer hash, and sequences are numbered per shard
 * (`shard` × `seq`). Each shard's cumulative sum is one window partition;
 * `shards` scales with the cluster (shards ≈ executors × cores keeps every
 * partition's sort in memory), so the operator is embarrassingly parallel
 * across shards at any corpus size. Within a shard the order is doc_id —
 * deterministic on any engine, any partitioning, any rerun.
 *
 * The hash is plain int64 arithmetic (`(id * 2654435761) % shards`), not
 * murmur/xxhash, so an external engine (the DuckDB oracle, a downstream
 * reader) reproduces the exact same layout bit-for-bit.
 */
object Packing {

  /** Chunk rows: one output row per (document × sequence it overlaps).
    *
    * @param docs      input with an int64 id column and a token-count column
    * @param idCol     document id (drives shard hash and in-shard order)
    * @param tokensCol per-document token count (int)
    * @param budget    tokens per packed sequence
    * @param shards    number of independent packing shards
    * @return (shard, seq, doc_id, tok_start, tok_end, n_toks) where
    *         tok_start/tok_end are the doc's half-open span inside the
    *         sequence-local [0, budget) token axis
    */
  def concatChunk(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Int, shards: Int): DataFrame = {
    val d = docs.select(col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n_toks"))
      .withColumn("shard", pmod(col("doc_id") * lit(2654435761L), lit(shards.toLong)))
    // Running token offset of each doc inside its shard's concatenated
    // stream: one shuffle on shard, one in-partition sort.
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pos = d
      .withColumn("s", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("e", col("s") + col("n_toks"))
    // A doc spans sequences floor(s/B) .. floor((e-1)/B); the explode is
    // bounded by ceil(n_toks/B)+1 rows per doc.
    pos
      .select(col("shard"), col("doc_id"), col("s"), col("e"),
        explode(sequence(expr(s"s div $budget"), expr(s"(e - 1) div $budget")))
          .as("seq"))
      .select(col("shard"), col("seq"), col("doc_id"),
        (greatest(col("s"), col("seq") * budget) - col("seq") * budget).as("tok_start"),
        (least(col("e"), (col("seq") + 1) * budget) - col("seq") * budget).as("tok_end"))
      .withColumn("n_toks", col("tok_end") - col("tok_start"))
  }
}
