package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: size the q149 atom graph at a given sf — decides whether
  * the bounded-CC driver guard actually engages. Not part of the contract. */
object Q149Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.engine.FastScratch.init()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.engine.Tables.table(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_type", "p_name")
    val g = p.groupBy("p_name", "p_brand", "p_type")
      .agg(min("p_partkey").as("node"), count(lit(1)).as("cnt"))
    val nn = graft.operators.FuzzyJoin
      .similarStringPairs(p.select("p_name"), "p_name", 3)
    val sym = nn.select(explode(array(
        struct(col("str_a"), col("str_b")),
        struct(col("str_b").as("str_a"), col("str_a").as("str_b")))).as("pr"))
      .select(col("pr.str_a").as("str_a"), col("pr.str_b").as("str_b"))
    val edges = g.select(col("p_name").as("str_a"), col("p_brand"),
        col("p_type"), col("node").as("u"))
      .join(broadcast(sym), "str_a")
      .join(g.select(col("p_name").as("str_b"), col("p_brand"),
        col("p_type"), col("node").as("v")), Seq("str_b", "p_brand", "p_type"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    println(s"Q149PROBE atoms=${g.count()} namePairs=${nn.count()} atomEdges=${edges.count()}")
    spark.stop()
  }
}
