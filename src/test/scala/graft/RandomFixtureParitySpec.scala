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
        rnd.nextInt(50).toLong, types(rnd.nextInt(types.size)), v,
        s"""{"k": ${1 + rnd.nextInt(60)}}""")
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
    "q136_token_lift", "q107_curriculum_buckets", "q20_agg_rollup",
    "q71_stratified_sample", "q140_chi2_feature", "q68_array_predicates",
    "q147_padding_audit")

  for (seed <- Seq(5, 6)) {
    test(s"text family matches DuckDB on random docs fixture seed=$seed") {
      val dir = writeRandomDocs(seed)
      docsOnlyQueries.foreach { q =>
        withClue(q) { parity(q, dir, Seq("documents")) }
      }
    }
  }

  /** Random star-schema fixture with referential integrity but WIDER
    * value ranges than the driver's generator (full-mantissa prices to
    * 5e7, negative balances, fractional quantities, mixed-length
    * strings) — the relational decimal chains get the same beyond-the-
    * generated-distribution treatment as the quality family. */
  private def writeRandomStar(seed: Int): String = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"rand_star_$seed")
    def write(table: String, fields: Seq[(String, DataType)], rows: Seq[Row]): Unit =
      ParquetFixtures.writeSingleFile(
        spark.createDataFrame(rows.asJava,
          StructType(fields.map { case (n, t) => StructField(n, t) })), dir, table)
    // the generator's (TPC-H-era) date range — query predicates anchor on it
    def day(off: Int) = java.time.LocalDateTime.of(1995, 1, 1, 0, 0)
      .plusDays(off.toLong)
    val segs = Vector("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val pris = Vector("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    write("region", graft.engine.Tables.canonical("region"),
      (0 until 3).map(i => Row(i, s"REGION_$i")))
    write("nation", graft.engine.Tables.canonical("nation"),
      (0 until 8).map(i => Row(i, s"NATION_${"ABCDEFGH"(i)}", i % 3)))
    write("customer", graft.engine.Tables.canonical("customer"),
      (0 until 60).map(i => Row(i.toLong, s"Customer#${1000 + i}", i % 8,
        rnd.nextDouble() * 20000 - 5000, segs(rnd.nextInt(5)))))
    write("supplier", graft.engine.Tables.canonical("supplier"),
      (0 until 15).map(i => Row(i.toLong, s"Supplier#${100 + i}", i % 8,
        rnd.nextDouble() * 12000 - 2000)))
    write("part", graft.engine.Tables.canonical("part"),
      (0 until 40).map(i => Row(i.toLong, s"part name ${rnd.nextInt(1000)}",
        s"Brand#${rnd.nextInt(5)}${rnd.nextInt(5)}",
        Vector("ECONOMY", "STANDARD", "PROMO")(rnd.nextInt(3)) + " BRASS",
        1 + rnd.nextInt(50), rnd.nextDouble() * 2000)))
    write("orders", graft.engine.Tables.canonical("orders"),
      (0 until 300).map(i => Row(i.toLong, rnd.nextInt(60).toLong,
        Vector("F", "O", "P")(rnd.nextInt(3)),
        // mostly the driver-like price band (keeps banded predicates like
        // q04's BETWEEN populated), with 5% full-mantissa 5e7 spikes so
        // decimal sums still see beyond-generator magnitudes
        (if (rnd.nextInt(20) == 0) rnd.nextDouble() * 5e7
         else rnd.nextDouble() * 200000),
        day(rnd.nextInt(1400)), pris(rnd.nextInt(5)))))
    write("lineitem", graft.engine.Tables.canonical("lineitem"),
      (0 until 1200).map { i =>
        Row(rnd.nextInt(300).toLong, rnd.nextInt(40).toLong,
          rnd.nextInt(15).toLong, 1 + rnd.nextInt(7),
          rnd.nextDouble() * 60, rnd.nextDouble() * 120000,
          rnd.nextDouble() * 0.6, rnd.nextDouble() * 0.1,
          Vector("A", "N", "R")(rnd.nextInt(3)),
          Vector("F", "O")(rnd.nextInt(2)), day(rnd.nextInt(1400)))
      })
    dir.toString
  }

  private val starTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem")
  private val starQueries = Seq(
    "q01_scan_project_filter", "q04_filter_complex", "q05_string_funcs",
    "q06_date_funcs", "q07_math_funcs", "q10_join_broadcast",
    "q11_join_shuffle", "q12_join_multiway", "q13_join_semi",
    "q14_join_anti", "q15_join_outer", "q16_join_range_theta",
    "q18_agg_hash", "q22_grouping_sets",
    "q25_window_rank", "q26_window_lag", "q27_window_frame",
    "q28_topk_global", "q29_set_ops", "q57_tpch_q3_shape",
    "q58_agg_percentile", "q65_window_ranks",
    "q83_histogram", "q84_string_agg", "q91_profile_columns",
    "q92_correlated_subquery",
    // r06-late widening: the warehouse/maintenance decimal chains get the
    // same beyond-the-generator treatment (spiked prices flow through
    // merge/diff/compact/zorder/materialized-agg paths)
    "q24_udaf_second_max", "q60_sample", "q64_merge_upsert",
    "q90_compact_small_files", "q95_higher_order_funcs", "q96_map_funcs",
    "q103_bloom_semi_join", "q117_snapshot_diff", "q121_incremental_agg",
    "q122_zorder_layout", "q142_skew_profile", "q149_entity_resolution")

  for (seed <- Seq(8, 9)) {
    test(s"relational core matches DuckDB on random star fixture seed=$seed") {
      val dir = writeRandomStar(seed)
      starQueries.foreach { q =>
        withClue(q) { parity(q, dir, starTables) }
      }
    }
  }

  // every events-only query in the quality family — the whole
  // decimal/percentile/window surface gets the randomized treatment
  private val eventsOnlyQueries = Seq(
    "q129_outlier_zscore", "q130_drift_tvd", "q131_ewma_smooth",
    "q133_event_funnel", "q134_winsorize", "q135_cohort_retention",
    "q137_outlier_iqr", "q138_interevent_gap", "q139_pagerank",
    "q141_corr_audit", "q143_personalized_pagerank", "q144_markov_transitions",
    "q145_graph_degrees", "q146_partitioned_layout", "q148_ab_lift",
    "q150_shortest_paths")

  for (seed <- Seq(1, 2, 3)) {
    test(s"quality family matches DuckDB on random fixture seed=$seed") {
      val dir = writeRandomEvents(seed)
      eventsOnlyQueries.foreach(q => parity(q, dir))
    }
  }
}
