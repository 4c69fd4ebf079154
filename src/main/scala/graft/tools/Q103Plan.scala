package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.BloomFilter
object Q103Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $tag%-20s ${(System.nanoTime()-t0)/1e9}%.2f  ($r)")
    }
    for (rep <- 1 to 2) {
      time(s"construct-$rep") {
        val urgent = Tables.table(spark, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
        val pre = BloomFilter.semiFilter(Tables.table(spark, dir, "lineitem"), "l_orderkey",
          urgent, "o_orderkey", 1 << 20, 5)
        val q = pre.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("decimal(38,2)").cast("double").as("sum_qty"))
          .orderBy("l_returnflag")
        time(s"count-$rep")(q.count())
      }
    }
    spark.stop()
  }
}
