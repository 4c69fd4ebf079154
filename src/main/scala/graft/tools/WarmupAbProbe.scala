package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, SparkEntry}

/** r17 A/B for the warm-session completion: one FRESH-JVM run per side
  * (codegen caches are JVM-global, so the sides must be separate
  * processes), each = Bench's session config + warmup per `mode` + ONE
  * timed pass over all queries in sorted order. Run the sides
  * interleaved (full, legacy, legacy, full) so a host-window drift can't
  * masquerade as a win; compare totals and the per-query lines.
  *
  * mode "legacy" = the r05–r16 curated 21-shape list; mode "full" =
  * Bench.warmupQueries (every declared shape, the shipped r17 value).
  */
object WarmupAbProbe {
  val legacyList: Seq[String] =
    Seq("q12_join_multiway", "q18_agg_hash", "q25_window_rank", "q36_text_tf",
      "q03_multiformat_sink", "q52_bucketed_join", "q33_sim_cosine_topk",
      "q17_join_asof", "q42_stream_watermark_dedup",
      "q72_avro_container_roundtrip", "q76_orc_roundtrip", "q75_dedup_components",
      "q66_fuzzy_levenshtein", "q111_hard_negatives", "q124_jaccard_postings",
      "q139_pagerank", "q143_personalized_pagerank", "q145_graph_degrees",
      "q150_shortest_paths", "q149_entity_resolution", "q152_pagerank_states")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "full"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = graft.engine.FastScratch.init()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    scratch.foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warmSf = "/root/testdata/sf0.001"
    val list = if (mode == "legacy") legacyList else Bench.warmupQueries
    list.foreach { q =>
      try SparkEntry.queries(q)(spark, warmSf).count()
      catch { case e: Throwable => System.err.println(s"warmup $q: $e") }
    }
    try SparkEntry.queries("q52_bucketed_join")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // The bench's shuffle canary, for window classification of this run.
    def canary(): Double = try {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries("q11_join_shuffle")(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    } catch { case _: Throwable => -1.0 }
    val pre = canary()
    val res = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val post = canary()
    res.foreach { case (n, t) => println(f"WARMAB $mode $n%-35s $t%.3f") }
    println(f"WARMAB_TOTAL mode=$mode total=${res.map(_._2).sum}%.2f " +
      f"canary_pre=$pre%.3f canary_post=$post%.3f")
    graft.engine.CacheReaper.release()
    spark.stop()
  }
}
