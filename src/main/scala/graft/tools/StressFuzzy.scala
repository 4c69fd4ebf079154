package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/**
 * Fuzzy-matching scaling stress (VERDICT r04 #1): candidate volume of the
 * PassJoin segment blocking vs metadata blocking as the corpus grows.
 *
 * Corpus model mirrors the part table's name shape: a combinatorial
 * adjective+noun vocabulary whose word lists grow as sqrt(scale) (so the
 * vocabulary grows ~linearly with the corpus — the CONSERVATIVE case for
 * PassJoin; a fixed vocabulary is strictly easier), and rows assigned to
 * names uniformly by hash. Metadata blocking is modeled as 150 fixed
 * blocks (the (brand, type) cardinality of the testdata) — its candidate
 * count is Σ C(block, 2), computed analytically, no pairs materialized.
 *
 * A scale-safe plan must show PassJoin candidates growing ~linearly while
 * metadata candidates grow ~quadratically. Results go to SCALING.md.
 *
 * Usage: runMain graft.tools.StressFuzzy [scales, default "1,10,100"]
 *          [fixed word-list size — omit for sqrt(scale) growth]
 */
object StressFuzzy {

  /** Deterministic 3–6 char pseudo-word from a seed expression. */
  private def wordSql(seedSql: String, salt: Int): String =
    s"concat_ws('', transform(sequence(0, 2 + cast(pmod(xxhash64($seedSql, 'len$salt'), 4) AS INT)), " +
      s"i -> char(ascii('a') + pmod(xxhash64($seedSql, i, $salt), 26))))"

  /** `rows` corpus rows over an adjective×noun vocabulary of `w`×`w` words. */
  private def corpus(s: SparkSession, rows: Long, w: Int): DataFrame = {
    val vocab = s.range(w.toLong * w).select(col("id").as("vid"),
      expr(s"concat(${wordSql(s"id div $w", 1)}, ' ', ${wordSql(s"id % $w", 2)})").as("name"))
    s.range(rows).select(pmod(xxhash64(col("id")), lit(w.toLong * w)).as("vid"))
      .join(vocab, "vid").select("name")
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val fixedW = if (args.length > 1) Some(args(1).toInt) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tau = 3
    println("| scale | rows | vocab | passjoin cands | passjoin pairs | seconds | metadata cands |")
    println("|---|---|---|---|---|---|---|")
    for (scale <- scales) {
      val rows = 2000L * scale
      val w = fixedW.getOrElse(math.round(8 * math.sqrt(scale.toDouble)).toInt)
      val df = corpus(spark, rows, w).cache()
      df.count()
      val names = df.distinct()
      val vocab = names.count()

      // raw candidate volume of the lossless blocking (pre-verify): the
      // segment ⋈ windowed-substring equi-join over distinct values
      val big = names.where(length(col("name")) >= tau + 1)
      val segs = big.select(col("name").as("pn"),
        explode(FuzzyJoin.segmentKeys("name", tau)).as("k"))
      val probes = big.select(col("name").as("rn"),
        explode(FuzzyJoin.probeKeys("name", tau)).as("k"))
      val (cands, _) = timed(segs.join(probes, segs("k") === probes("k"))
        .where(col("pn") =!= col("rn"))
        .select(least(col("pn"), col("rn")), greatest(col("pn"), col("rn")))
        .distinct().count())

      val (pairs, secs) = timed(
        FuzzyJoin.similarStringPairs(df, "name", tau).count())

      // metadata blocking modeled analytically: Σ C(block, 2) over 150
      // fixed blocks of the CORPUS (not the vocabulary) — what the old
      // (brand, type) plan would feed its verify stage
      val meta = df.select(pmod(xxhash64(col("name")), lit(150)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)

      println(f"| ${scale}x | $rows | $vocab | $cands | $pairs | $secs%.1f | $meta |")
      df.unpersist()
    }
    spark.stop()
  }
}
