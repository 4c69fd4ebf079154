package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** r17 interleaved A/B: q122's z-order layout write+read-back with the
  * legacy fixed 8 range partitions vs the scale-adaptive width (max of
  * defaultParallelism and size/128MB). Full q122 pipeline both sides,
  * alternating A/B per rep so a host-window drift cannot masquerade as a
  * win. Prints per-rep wall seconds and row-count parity. */
object Q122Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
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

    def zorderSqlSpark(a: String, b: String, bits: Int): String = {
      val terms = (0 until bits).flatMap { i =>
        Seq(s"shiftleft(shiftright($a, $i) & 1, ${2 * i})",
          s"shiftleft(shiftright($b, $i) & 1, ${2 * i + 1})")
      }
      terms.mkString("(", " + ", ")")
    }
    def run(parts: Option[Int]): (Double, Long) = {
      val t0 = System.nanoTime()
      val tmp = java.nio.file.Files.createTempDirectory("q122ab").toString
      val src = Tables.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"),
          expr(zorderSqlSpark("l_partkey", "l_suppkey", 20)).as("zval"))
      val n = parts.getOrElse {
        val target = 128L << 20
        val est = src.queryExecution.optimizedPlan.stats.sizeInBytes
        math.max(spark.sparkContext.defaultParallelism.toLong,
          ((est + target - 1) / target).toLong).toInt
      }
      src.repartitionByRange(n, col("zval")).sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(tmp)
      val rows = graft.engine.ops.WarehouseOps
        .zorderReadBack(spark.read.parquet(tmp)).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // warm both shapes once (untimed) so codegen compile stays out of reps
    run(Some(8)); run(None)
    (1 to reps).foreach { i =>
      val (ta, ra) = run(Some(8))
      val (tb, rb) = run(None)
      println(f"Q122AB rep$i legacy8=$ta%.2f adaptive=$tb%.2f rowsA=$ra rowsB=$rb")
    }
    spark.stop()
  }
}
