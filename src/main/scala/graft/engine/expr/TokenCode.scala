package graft.engine.expr

/**
 * The engine's shared portable token code — ascii(first char) · 31 +
 * length — in CODE POINTS (r05, ADVICE r04): Spark's `ascii()`/`length()`
 * and DuckDB's are code-point based (`ascii('𝄞')` = 119070, `length('𝄞')`
 * = 1 — verified empirically on Spark 4.1.2), while the native family's
 * former `charAt(0)`/`String.length` counted UTF-16 units — identical on
 * BMP text but silently divergent from the registered SQL functions'
 * lambda and oracle twins on astral (surrogate-pair) input. One helper so
 * the four native expressions (HashedShingles / RollingFingerprint /
 * WindowHashes / SimHashPack) cannot drift from each other.
 *
 * Empty tokens (double/leading/trailing spaces under split-keep-empties)
 * code as 0, exactly like `ascii('') * 31 + length('')`.
 */
object TokenCode {

  /** Code of a whole token string. */
  def of(s: String): Long =
    if (s.isEmpty) 0L
    else s.codePointAt(0).toLong * 31 + s.codePointCount(0, s.length)

  /** Code of the token spanning chars [from, until) of `s` — the
    * allocation-free form for RollingFingerprint's character walk. */
  def ofSpan(s: String, from: Int, until: Int): Long =
    if (until <= from) 0L
    else s.codePointAt(from).toLong * 31 + s.codePointCount(from, until)
}
