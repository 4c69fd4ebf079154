package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming-state scaling stress (VERDICT r04 #5; provider A/B r09,
 * VERDICT r08 #5): the q104 ledger shape — `flatMapGroupsWithState`
 * fingerprint-claim dedup — at 1×/10×/100× the event volume, split over
 * 4 micro-batches (`maxFilesPerTrigger=1`), so later batches run against
 * a populated store. The dup fraction is constant (30% planted pairs), so
 * distinct keys — and therefore state — grow linearly with input; a
 * scale-safe implementation must grow wall time ~linearly too (per-key
 * state work is O(1), the shuffle is one exchange per batch on the
 * fingerprint).
 *
 * Each shape runs under BOTH state store providers — the default
 * HDFS-backed in-memory store (what the shipping q42/q104 queries use)
 * and RocksDBStateStoreProvider. The in-memory store holds every key's
 * state on the executor heap, which is the real 100 TB streaming risk
 * (state must fit memory or the executor dies); RocksDB spills to local
 * disk with an in-heap block cache, trading per-access cost for a
 * state-size ceiling bounded by disk. The A/B quantifies that trade at
 * growing ledger cardinality. The provider is a per-query setting read
 * from the session conf at stream start, so the A/B flips it between
 * runs (fresh checkpoint per run — state formats are not interchangeable).
 *
 * The TTL'd variant (StreamDedup.dedupWithTtl, EventTimeTimeout) runs the
 * same corpus with event times spread over 4 hours and a 1-hour TTL: its
 * LIVE state is bounded by the keys per TTL horizon, the property that
 * matters on unbounded streams. Results go to SCALING.md.
 *
 * Usage: runMain graft.tools.StressStream [scales, default "1,10,100"]
 */
object StressStream {

  private val MemProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scales = (if (args.nonEmpty) args(0) else "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val base = 50000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8") // state partitions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    println("| scale | events | op | store | batches | seconds | emitted | distinct keys |")
    println("|---|---|---|---|---|---|---|---|")
    for (scale <- scales) {
      val rows = base * scale
      val root = Files.createTempDirectory(s"stress_stream_$scale").toString
      // 30% of ids form planted dup pairs (id%10 in 0..2 share a base id);
      // event time spreads uniformly over 4 hours
      val src = s"$root/src"
      // 4 quarter files written IN TIME ORDER (the file source picks files
      // up by mtime, so batch order follows event time — out-of-order
      // files would put whole batches behind the watermark, and the
      // stateful operator's late-data filter would drop them wholesale)
      for (q <- 0 until 4) {
        spark.range(q * rows / 4, (q + 1) * rows / 4).select(
            col("id").as("doc_id"),
            expr("xxhash64(CASE WHEN id % 10 <= 2 THEN id div 10 * 10 ELSE id END)")
              .as("fingerprint"),
            expr("timestamp_micros(CAST(id * (14400000000 div " + rows + ") AS BIGINT))")
              .as("ts"))
          .coalesce(1).write.mode("append").parquet(src)
        Thread.sleep(50) // distinct mtimes → deterministic pickup order
      }
      val distinctKeys = spark.read.parquet(src)
        .select(countDistinct("fingerprint")).collect()(0).getLong(0)
      val schema = spark.read.parquet(src).schema

      def runLedger(provider: String, cp: String): (Long, Long) = {
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        var emitted = 0L
        var batches = 0L
        val deduped = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .select(col("doc_id"), col("fingerprint")).as[(Long, Long)]
          .groupByKey(_._2)
          .flatMapGroupsWithState[Boolean, (Long, Long)](
            OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
            case (fp: Long, rs: Iterator[(Long, Long)], state: GroupState[Boolean]) =>
              if (state.exists) Iterator.empty
              else {
                var minId = Long.MaxValue
                rs.foreach { case (id, _) => if (id < minId) minId = id }
                state.update(true)
                Iterator((minId, fp))
              }
          }
        val q = deduped.toDF("doc_id", "fingerprint").writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$root/$cp")
          .foreachBatch { (b: DataFrame, _: Long) =>
            emitted += b.count(); batches += 1
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        (emitted, batches)
      }

      def runTtl(provider: String, cp: String): (Long, Long) = {
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        var emitted = 0L
        var batches = 0L
        val events = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src)
          .select(col("doc_id").as("id"), col("fingerprint").as("key"), col("ts"))
          .withWatermark("ts", "10 minutes")
          .as[graft.operators.StreamDedup.Event]
        val q = graft.operators.StreamDedup.dedupWithTtl(events, ttlMs = 3600000L)
          .toDF("id", "key", "n_claims").writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$root/$cp")
          .foreachBatch { (b: DataFrame, _: Long) =>
            emitted += b.count(); batches += 1
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        (emitted, batches)
      }

      for ((label, provider) <- Seq("mem" -> MemProvider, "rocksdb" -> RocksProvider)) {
        val ((em1, b1), t1) = timed(runLedger(provider, s"cp_ledger_$label"))
        val ((em2, b2), t2) = timed(runTtl(provider, s"cp_ttl_$label"))
        println(f"| ${scale}x | $rows | q104 ledger (NoTimeout) | $label | $b1 | $t1%.1f | $em1 | $distinctKeys |")
        println(f"| ${scale}x | $rows | dedupWithTtl (EventTimeTimeout 1h) | $label | $b2 | $t2%.1f | $em2 | $distinctKeys |")
      }
    }
    spark.stop()
  }
}
