package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import graft.SparkEntry

/** Dev utility: audit every query's physical plan for scale red flags. */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        def n(s: String) = s.r.findAllIn(p).size
        val flags = Seq(
          if (p.contains("CartesianProduct")) "CARTESIAN!" else "",
          if (p.contains("BroadcastNestedLoopJoin")) "BNLJ!" else "",
          f"ex=${n("\\(\\d+\\) Exchange")}",
          f"sort=${n("\\(\\d+\\) Sort")}",
          f"bhj=${n("BroadcastHashJoin")}",
          f"smj=${n("SortMergeJoin")}").filter(_.nonEmpty)
        println(f"PLAN $name%-28s ${flags.mkString(" ")}")
      } catch { case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
