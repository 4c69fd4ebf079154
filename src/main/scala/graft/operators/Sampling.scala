package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Consistent (hash-based) sampling — the reproducible alternative to
 * engine-RNG samplers for training-data curation. A row's admission is a
 * pure function of its KEY, not of the partitioning, the seed stream, or
 * the engine, which buys three properties RNG samplers cannot give:
 *
 *  - rerun-stable: the same corpus yields the same sample on every run,
 *    engine, and cluster layout (an RNG sample changes under repartition);
 *  - subset-consistent: thresholds nest, so the 5% sample is a SUBSET of
 *    the 10% sample — a curation pipeline can grow its sample without
 *    resampling everything it already processed;
 *  - join-stable: sampling two tables by the same key admits matching
 *    rows together, so sampled joins stay internally consistent.
 *
 * The hash is the engine's shared portable arithmetic (polynomial fold
 * mod 1e9+7, then an LCG scramble mod 1000003): plain int64 ops any
 * engine reproduces bit-for-bit, so a DuckDB oracle can verify the EXACT
 * sampled set — which is the point: a sampler you can audit. Spark's
 * `df.sample` / `stat.sampleBy` remain the built-in alternative when
 * statistical independence from the key matters more than reproducibility.
 */
object Sampling {

  private val Mod = 1000000007L
  private val M = 1000003L
  private val Mul = 2654435761L

  /** The portable admission hash in [0, 100): a polynomial fold of the key
    * columns (each cast to int64) followed by an LCG scramble. The scramble
    * decorrelates the percentile from key structure (sequential ids step
    * the raw polynomial by a constant, which would stripe raw residues).
    *
    * Keys must be INTEGRAL columns: a non-numeric key casts to NULL, the
    * hash propagates it, and the admission predicate silently drops the
    * row. For text keys, fingerprint first —
    * `admitted(pct, GraftFunctions.fingerprint("text"))` — which is the
    * same portable arithmetic and keeps the oracle property.
    *
    * Each key is pmod'ed into [0, Mod) before the fold (r05, ADVICE r04):
    * Spark's `%` keeps the dividend's sign, so a negative key would
    * produce a negative percentile that `< pct` ADMITS at every pct > 0,
    * and a raw key above ~Long.Max/131 would overflow the fold silently
    * in Spark but error in DuckDB — either way breaking the audit
    * property. With pmod the integral-key contract is total: any int64
    * key, any sign, and every intermediate stays < 2³⁸. */
  def admissionPct(keys: Seq[Column]): Column = {
    require(keys.nonEmpty, "consistent sampling needs at least one key column")
    val folded = keys.map(k => pmod(k.cast("long"), lit(Mod)))
      .reduce((acc, k) => (acc * 131L + k) % Mod)
    folded % M * Mul % M % 100L
  }

  /** Admission predicate keeping ~pct% of rows, consistently by key. */
  def admitted(pct: Int, keys: Column*): Column = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    admissionPct(keys) < pct
  }

  /** Per-stratum admission predicate: keeps ~pcts(stratum)% of each
    * stratum's rows (strata absent from the map are dropped) — the
    * consistent twin of `stat.sampleBy`. */
  def stratifiedAdmitted(strata: Column, pcts: Map[String, Int],
      keys: Column*): Column = {
    val h = admissionPct(keys)
    pcts.foldLeft(lit(false)) { case (acc, (stratum, pct)) =>
      acc || (strata === stratum && h < pct)
    }
  }
}
