package graft

import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.Row

/**
 * Oracle parity on RANDOMIZED fixtures — the driver's compare only ever
 * sees the one generated dataset, so data-dependent cross-engine rounding
 * edges (decimal division ties, downscale-cast behavior, double→decimal
 * conversion of awkward doubles) could hide in queries that happen to
 * pass on it. This suite re-runs the rounding-heaviest oracles (q129's
 * decimal mean/variance chain, q131's decimal EWMA, q134's percentile
 * clamp) on seeded-random events fixtures and asserts Spark ≡ DuckDB
 * row-for-row, using the same canonicalization as OracleParitySuite.
 */
class RandomFixtureParitySpec extends SparkTestBase {

  private def canon(v: Any): String = v match {
    case null => "NULL"
    case d: java.math.BigDecimal =>
      if (d.compareTo(java.math.BigDecimal.ZERO) == 0) "0"
      else d.stripTrailingZeros.toPlainString
    case d: BigDecimal => canon(d.bigDecimal)
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) d.toString
      else canon(java.math.BigDecimal.valueOf(d))
    case other => other.toString
  }

  private def writeRandomEvents(seed: Int): String = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"rand_parity_$seed")
    val types = Vector("view", "click", "purchase", "signup", "error")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val rows = (0 until 3000).map { i =>
      // raw full-precision doubles ON PURPOSE (the generator ships 2dp
      // values — random mantissas are the harder rounding case), heavy
      // tail via occasional 20× spikes
      val base = rnd.nextDouble() * 500.0
      val v = if (rnd.nextInt(40) == 0) base * 20.0 else base
      Row(i.toLong,
        new Timestamp(1704067200000L + math.abs(rnd.nextLong() % (30L * 86400 * 1000))),
        rnd.nextInt(50).toLong, types(rnd.nextInt(types.size)), v, """{"k": 1}""")
    }
    ParquetFixtures.writeSingleFile(
      spark.createDataFrame(rows.asJava, schema), dir, "events")
    dir.toString
  }

  private def parity(name: String, dir: String,
      tables: Seq[String] = Seq("events")): Unit = {
    val df = SparkEntry.queries(name)(spark, dir)
    val cols = df.columns.toSeq
    val order = cols.indices.sortBy(cols(_))
    val srows = df.collect().toSeq.map(r => order.map(i => canon(r.get(i))))
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      tables.foreach(t =>
        st.execute(s"CREATE VIEW $t AS SELECT * FROM read_parquet('$dir/$t.parquet')"))
      val rs = st.executeQuery(SparkEntry.oracleSql(name))
      val md = rs.getMetaData
      val n = md.getColumnCount
      val ocols = (1 to n).map(md.getColumnName)
      val oorder = ocols.indices.sortBy(ocols(_))
      val orows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      while (rs.next()) orows += oorder.map(i => canon(rs.getObject(i + 1)))
      assert(cols.sorted.map(_.toLowerCase) == ocols.sorted.map(_.toLowerCase))
      assert(srows.size == orows.size,
        s"$name rows: spark=${srows.size} oracle=${orows.size}")
      srows.zip(orows).zipWithIndex.foreach { case ((s, o), i) =>
        assert(s == o, s"$name row $i differs:\n  spark =$s\n  oracle=$o")
      }
      assert(srows.nonEmpty, s"$name produced no rows — fixture too tame")
    } finally conn.close()
  }

  private def writeRandomDocs(seed: Int): String = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"rand_docs_$seed")
    val langs = Vector("de", "en", "es", "fr", "zh")
    // vocabulary mixing stopwords (q44's ratio paths), digits (q45's
    // regex tokenizer), and skewed content words; token counts 3..60
    val vocab = Vector("the", "a", "of", "and", "data", "spark", "query",
      "scan", "x1", "42", "window", "join", "fast", "part", "zz9") ++
      (0 until 40).map(i => s"w$i")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    val rows = (0 until 800).map { i =>
      val n = 3 + rnd.nextInt(58)
      // plant exact duplicates and near-duplicates for the dedup shapes
      val text =
        if (i % 50 == 49) "the a of and data spark query scan"
        else {
          val base = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
          // ~5% of docs carry singleton tokens so OOV detection (q114)
          // and the rare end of the tf-idf/BM25 spectrum have real rows
          val spiked = if (rnd.nextInt(20) == 0) base :+ s"rare$i" else base
          spiked.mkString(" ")
        }
      Row(i.toLong, text, langs(rnd.nextInt(langs.size)),
        s"src${rnd.nextInt(20)}", text.length.toLong)
    }
    ParquetFixtures.writeSingleFile(
      spark.createDataFrame(rows.asJava, schema), dir, "documents")
    dir.toString
  }

  private val docsOnlyQueries = Seq(
    "q36_text_tf", "q37_text_bigrams", "q38_text_stats", "q43_text_langid",
    "q44_text_quality", "q45_text_tokencount", "q46_text_fingerprint",
    "q100_repetition_filter", "q101_tfidf_topterms", "q114_oov_docs",
    "q118_bm25_topk", "q120_bpe_pair_stats", "q132_ngram_novelty",
    "q136_token_lift")

  for (seed <- Seq(5, 6)) {
    test(s"text family matches DuckDB on random docs fixture seed=$seed") {
      val dir = writeRandomDocs(seed)
      docsOnlyQueries.foreach { q =>
        withClue(q) { parity(q, dir, Seq("documents")) }
      }
    }
  }

  // every events-only query in the quality family — the whole
  // decimal/percentile/window surface gets the randomized treatment
  private val eventsOnlyQueries = Seq(
    "q129_outlier_zscore", "q130_drift_tvd", "q131_ewma_smooth",
    "q133_event_funnel", "q134_winsorize", "q135_cohort_retention",
    "q137_outlier_iqr", "q138_interevent_gap")

  for (seed <- Seq(1, 2, 3)) {
    test(s"quality family matches DuckDB on random fixture seed=$seed") {
      val dir = writeRandomEvents(seed)
      eventsOnlyQueries.foreach(q => parity(q, dir))
    }
  }
}
