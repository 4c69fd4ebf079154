package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** PassJoin segment blocking (FuzzyJoin): the operator's contract is
  * LOSSLESS candidate generation — every pair within edit distance tau
  * must survive the blocking. Asserted against brute force on real data
  * and on adversarial insert/delete/substitute variants (indels shift
  * positions, the case naive fixed-position segment equality would miss).
  */
class FuzzyJoinSpec extends SparkTestBase {

  import spark.implicits._

  /** Ground truth: all unordered distinct-value pairs with 1 <= lev <= tau,
    * via the UNBOUNDED levenshtein over a brute cross join. */
  private def brutePairs(vals: DataFrame, tau: Int): Set[(String, String, Int)] = {
    val v = vals.select(col(vals.columns.head).cast("string").as("s")).distinct()
    v.as("a").crossJoin(v.as("b"))
      .where(col("a.s") < col("b.s"))
      .select(col("a.s"), col("b.s"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
      .where(col("dist").between(1, tau))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  private def passJoinPairs(vals: DataFrame, tau: Int): Set[(String, String, Int)] =
    FuzzyJoin.similarStringPairs(vals, vals.columns.head, tau)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("similarStringPairs is complete and exact on the part vocabulary") {
    val names = spark.read.parquet(s"$sfDir/part.parquet").select("p_name")
    assert(passJoinPairs(names, 3) == brutePairs(names, 3))
  }

  test("similarStringPairs survives adversarial insert/delete variants") {
    // deterministic LCG so the variant set (and thus the assertion) is
    // reproducible; ops include INSERTIONS and DELETIONS, which shift
    // every later character — the pigeonhole window must absorb that
    var seed = 12345L
    def nextInt(n: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      (seed % n).toInt
    }
    val base = Seq("abcdefghij", "kilimanjaro", "sparkline", "abcd")
    val variants = scala.collection.mutable.Set[String](base: _*)
    for (s <- base; _ <- 1 to 40) {
      val t = scala.collection.mutable.ArrayBuffer[Char](s: _*)
      for (_ <- 1 to (1 + nextInt(3))) nextInt(3) match {
        case 0 => t.insert(nextInt(t.length + 1), "abcxyz" (nextInt(6)))
        case 1 => if (t.length > 4) t.remove(nextInt(t.length))
        case _ => t(nextInt(t.length)) = "abcxyz" (nextInt(6))
      }
      if (t.length >= 4) variants += t.mkString
    }
    val df = variants.toSeq.toDF("s")
    val truth = brutePairs(df, 3)
    assert(truth.nonEmpty, "variant generator produced no near pairs")
    assert(passJoinPairs(df, 3) == truth)
  }

  test("strings shorter than tau+1 chars pair through the tiny branch") {
    val df = Seq("ab", "abc", "abcd", "abcde", "abcdefg", "xyz", "x", "")
      .toDF("s")
    assert(passJoinPairs(df, 3) == brutePairs(df, 3))
    // and tau=1 (nseg=2): different segment arithmetic, same contract
    assert(passJoinPairs(df, 1) == brutePairs(df, 1))
  }

  test("non-ASCII and astral strings pair correctly (code-point consistency)") {
    // Spark's length()/substring()/levenshtein() are all code-point based,
    // so the segment arithmetic must stay consistent on multi-byte and
    // surrogate-pair text — a UTF-16-unit slip would mis-place segment
    // windows and silently lose pairs.
    val df = Seq(
      "héllo wörld", "hällo wörld", "héllo wörlds",  // BMP accents, dist 1
      "中文的字符串", "中文的字符乱", "中文的字符",      // CJK, dist 1
      "𝄞𝄞abcd", "𝄞𝄞abed", "𝄞𝄞abcdxyz",               // astral leads
      "plain text", "plain test").toDF("s")
    assert(passJoinPairs(df, 3) == brutePairs(df, 3))
  }

  test("probe fan-out per string is bounded by (tau+1)^2 * (2tau+1)") {
    val tau = 3
    val bound = (tau + 1) * (tau + 1) * (2 * tau + 1)
    val names = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_name").as("s")).distinct()
    val mx = names.select(size(FuzzyJoin.probeKeys("s", tau)).as("n"))
      .agg(max("n")).collect()(0).getInt(0)
    assert(mx <= bound, s"probe key fan-out $mx exceeds bound $bound")
  }
}
