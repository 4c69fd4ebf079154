package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed register-blocked Bloom filter for semi-join pruning — the
 * runtime row-level filter a 100 TB engine uses to drop probe-side rows
 * BEFORE they reach a shuffle or an exact join. Spark's optimizer injects
 * the same shape automatically in narrow cases
 * (`runtime.bloomFilter.enabled`); this is the explicit library form for
 * when the build side is a derived key set.
 *
 * Layout: the blocked design of Putze/Sanders/Singler (also the basis of
 * Parquet's split-block bloom filters), with a 64-bit block: hash0 picks
 * ONE word of the bitset, hash1 derives all k bit positions inside that
 * word (6 bits each from one xxhash64). Chosen over the classic k-probe
 * layout for how it executes in Spark, not just for cache locality:
 *   - the probe references the bitset array ONCE, so the scalar subquery
 *     delivering it appears once per predicate — k independent probes
 *     each embed their own Subquery instance (and predicate pushdown then
 *     duplicates them into every join side), which re-ran the whole
 *     distributed build up to 2k times (measured 14 s at sf0.1; this
 *     shape: sub-second);
 *   - 2 xxhash64 evaluations per row instead of 2k;
 *   - the word test is a single `(word & mask) = mask` — pure codegen
 *     arithmetic, no lambda (higher-order functions have no doGenCode and
 *     would push the probe out of whole-stage codegen).
 *
 * Build: per-word `bit_or` partial aggregates → ONE row holding
 * `array<long>` of m/64 words (m=2^20 ⇒ 128 KiB). Delivery to the probe
 * is a BOUNDED driver materialization embedded as a literal array — the
 * same driver-side bloom materialization Spark's own runtime-filter
 * injection performs via its scalar subquery. An actual scalar subquery
 * was measured 50× slower here (13 s vs 0.27 s at sf0.1): ScalarSubquery
 * is a codegen-fallback expression, so `element_at(subquery, i)` drops to
 * interpreted eval per row and re-boxes the 16 K-word array result each
 * time. The literal costs one fixed 128 KiB reduction regardless of data
 * scale — it is NOT an unbounded collect.
 *
 * False positives are possible (per-word load n k / (m/64) bits of 64),
 * false negatives are not, so callers follow with an exact join to
 * reconcile — the bloom is a performance layer that never changes
 * semantics. With the probe side 1000× the build side, the pre-filter
 * removes the vast majority of probe rows at scan time, which is exactly
 * the scan-versus-shuffle trade that matters at 100 TB.
 */
object BloomFilter {

  /** word index (0-based) and the k-bit in-word mask for a key. */
  private def wordAndMask(keyCol: String, bits: Int, hashes: Int): (String, String) = {
    val words = bits / 64
    val w = s"cast(pmod(xxhash64($keyCol, 0), ${words}L) AS INT)"
    val m = (0 until hashes)
      .map(j => s"shiftleft(1L, cast(shiftright(xxhash64($keyCol, 1), ${6 * j}) & 63 AS INT))")
      .mkString(" | ")
    (w, s"($m)")
  }

  /** Build the bitset: distributed per-word `bit_or` partials, then the
    * BOUNDED sparse (word, bits) result — at most m/64 rows of 12 bytes,
    * independent of key count — densified into the final array on the
    * driver. (A first cut densified in-plan via
    * `transform(sequence(0, W-1), i -> element_at(map, i))`; Spark's map
    * lookup is a linear scan and the lambda is interpreted, so that
    * projection was O(W²) interpreted work — 19 s at W=16384. Plain Scala
    * on 16 K rows is microseconds.) `keys` may contain duplicates
    * (idempotent bit-sets). */
  def buildWords(keys: DataFrame, keyCol: String, bits: Int, hashes: Int): Array[Long] = {
    require(bits % 64 == 0, s"bits must be a multiple of 64, got $bits")
    val (w, m) = wordAndMask(keyCol, bits, hashes)
    val arr = new Array[Long](bits / 64)
    keys
      .select(expr(w).as("w"), expr(m).as("b"))
      .groupBy("w").agg(expr("bit_or(b)").as("b"))
      .collect()
      .foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against an `array<long>` bits column (word indexed by
    * hash0, all-k-bits mask from hash1; array referenced ONCE). */
  def mightContain(bitsCol: Column, keyCol: String, bits: Int, hashes: Int): Column = {
    val (w, m) = wordAndMask(keyCol, bits, hashes)
    element_at(bitsCol, expr(w) + lit(1)).bitwiseAND(expr(m)) === expr(m)
  }

  /** Pre-filter `big` to rows whose `bigKey` might be in `keys.smallKey`.
    * Superset of the exact semi-join (no false negatives); follow with an
    * exact join to eliminate the false positives. Runs the distributed
    * build and materializes the m/64-word bitset (bounded — see above). */
  def semiFilter(big: DataFrame, bigKey: String,
      keys: DataFrame, smallKey: String, bits: Int, hashes: Int): DataFrame = {
    val words = buildWords(keys, smallKey, bits, hashes)
    big.where(mightContain(typedLit(words), bigKey, bits, hashes))
  }
}
