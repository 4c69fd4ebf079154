package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance (fuzzy) string matching with CONTENT-DERIVED blocking —
 * the PassJoin pigeonhole scheme (Li/Deng/Feng, "PASS-JOIN: a
 * partition-based method for similarity joins in databases", PVLDB 5(3),
 * 2011 — public literature, no code consulted).
 *
 * Principle: partition a string s into tau+1 disjoint segments. Editing s
 * into any r with at most tau edits cannot touch all tau+1 segments, so at
 * least one segment survives VERBATIM as a substring of r — shifted by at
 * most tau positions (each edit before the segment shifts it by at most
 * one). Candidate generation is therefore an equi-join between the segment
 * keys of one side and the windowed-substring keys of the other; the block
 * key is derived from string CONTENT, its cardinality grows with the
 * vocabulary, and per-key work is bounded by value frequency — unlike
 * metadata blocking (fixed block count, blocks grow linearly with the
 * corpus, pairwise work quadratically: the r02 lesson in SCALING.md).
 *
 * The blocking is LOSSLESS (a completeness property, asserted against
 * brute force in FuzzyJoinSpec, including adversarial insert/delete
 * variants) — so callers' answers are purely declarative (all pairs with
 * dist ≤ tau) and any oracle can verify them without replicating the
 * blocking.
 */
object FuzzyJoin {

  // Segment arithmetic for an L-char string split into nseg segments: the
  // first nseg - (L mod nseg) segments have length L div nseg, the rest
  // one more. Both key generators must use the identical scheme.
  private def segLen(l: String, i: String, nseg: Int): String =
    s"(($l div $nseg) + if($i >= $nseg - ($l % $nseg), 1, 0))"
  private def segStart(l: String, i: String, nseg: Int): String =
    s"($i * ($l div $nseg) + greatest(0, $i - ($nseg - ($l % $nseg))))"

  /** Segment keys of the PARTITIONED side: one (i, l, txt) per segment,
    * where l = length(s). Caller must pre-filter length(s) >= tau+1. */
  private[graft] def segmentKeys(s: String, tau: Int): Column = {
    val nseg = tau + 1
    val l = s"length($s)"
    expr(
      s"""transform(sequence(0, $tau), i -> named_struct(
         |  'i', i, 'l', $l,
         |  'txt', substring($s, ${segStart(l, "i", nseg)} + 1,
         |                   ${segLen(l, "i", nseg)})))""".stripMargin)
  }

  /** Substring probe keys of the OTHER side: for each partner length pl in
    * [length(r)-tau, length(r)] (the pair is generated from the side where
    * the partitioned string is the shorter — equal lengths appear from both
    * sides and canonicalization dedups), each segment index, and each start
    * position within ±tau of the segment's home position, one (i, pl, txt).
    * ≤ (tau+1)²·(2tau+1) keys per string — constant per row. Caller must
    * pre-filter length(r) >= tau+1 (the window bounds assume it). */
  private[graft] def probeKeys(r: String, tau: Int): Column = {
    val nseg = tau + 1
    val p = segStart("pl", "i", nseg)
    val sl = segLen("pl", "i", nseg)
    expr(
      s"""flatten(flatten(
         |  transform(sequence(greatest($nseg, length($r) - $tau), length($r)), pl ->
         |    transform(sequence(0, $tau), i ->
         |      transform(sequence(greatest(0, $p - $tau),
         |                         least(length($r) - $sl, $p + $tau)),
         |        st -> named_struct('i', i, 'l', pl,
         |          'txt', substring($r, st + 1, $sl)))))))""".stripMargin)
  }

  /** All unordered pairs of DISTINCT values of `strCol` within edit
    * distance `tau` (1 ≤ dist ≤ tau; identical values are the caller's
    * exact-match branch — a plain group-by, not a similarity problem).
    *
    * Plan: distinct values (vocabulary-scale, not corpus-scale) → segment
    * keys ⋈ windowed-substring keys on (i, l, txt) → canonicalize + dedup
    * candidates → verify with the THRESHOLDED levenshtein (banded O(n·tau)
    * DP that bails out past tau). Strings shorter than tau+1 chars cannot
    * be partitioned into tau+1 non-empty segments; they pair via a
    * bounded side branch (tiny values × values of length ≤ 2·tau, both
    * alphabet-bounded sets, broadcast).
    *
    * Output: (str_a, str_b, dist) with str_a < str_b.
    */
  def similarStringPairs(strings: DataFrame, strCol: String, tau: Int = 3): DataFrame = {
    require(tau >= 1, "tau must be >= 1")
    val nseg = tau + 1
    val vals = strings.select(col(strCol).cast("string").as("__s"))
      .where(col("__s").isNotNull).distinct()
    val big = vals.where(length(col("__s")) >= nseg)
    val segs = big
      .select(col("__s").as("__part"), explode(segmentKeys("__s", tau)).as("__k"))
      .select(col("__part"), col("__k.i").as("__i"), col("__k.l").as("__l"),
        col("__k.txt").as("__txt"))
    val probes = big
      .select(col("__s").as("__probe"), explode(probeKeys("__s", tau)).as("__k"))
      .select(col("__probe"), col("__k.i").as("__i"), col("__k.l").as("__l"),
        col("__k.txt").as("__txt"))
    val main = segs.join(probes, Seq("__i", "__l", "__txt"))
      .where(col("__part") =!= col("__probe"))
      .select(least(col("__part"), col("__probe")).as("str_a"),
        greatest(col("__part"), col("__probe")).as("str_b"))
    val tiny = vals.where(length(col("__s")) < nseg).select(col("__s").as("__t"))
    val tinyPairs = vals.where(length(col("__s")) <= nseg - 1 + tau)
      .join(broadcast(tiny), col("__t") =!= col("__s")
        && abs(length(col("__t")) - length(col("__s"))) <= tau)
      .select(least(col("__t"), col("__s")).as("str_a"),
        greatest(col("__t"), col("__s")).as("str_b"))
    main.unionByName(tinyPairs).distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), tau))
      .where(col("dist").between(1, tau))
  }
}
