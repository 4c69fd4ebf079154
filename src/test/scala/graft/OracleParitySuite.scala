package graft

import java.sql.{DriverManager, Types}

import scala.collection.mutable

import org.apache.spark.sql.Row

/**
 * The centerpiece suite (SURVEY §5.2.1): an in-JVM rehearsal of the driver's
 * t2 check. Every SparkEntry query with an oracle is executed on Spark AND
 * on DuckDB (views over the same sf0.001 parquet), canonicalized with
 * columns sorted by name (the driver's compare order), and asserted
 * row-for-row equal. Oracle-less queries get the driver's weaker rows>0.
 */
class OracleParitySuite extends SparkTestBase {

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def canon(v: Any): String = v match {
    case null => "NULL"
    case d: java.math.BigDecimal =>
      if (d.compareTo(java.math.BigDecimal.ZERO) == 0) "0"
      else d.stripTrailingZeros.toPlainString
    case d: BigDecimal => canon(d.bigDecimal)
    case t: java.sql.Timestamp => t.toInstant.toString
    case d: java.sql.Date => d.toString
    // Uniform double rendering: Java's Double.toString switches to
    // scientific notation at 1e7 while DuckDB's JDBC may surface the same
    // DOUBLE as a BigDecimal ("21406214.43") — normalize both through
    // plain decimal form so equal values compare equal. (The driver's
    // python comparator is type-based and has no such gap.)
    case d: Double =>
      if (d.isNaN || d.isInfinite) d.toString
      else canon(java.math.BigDecimal.valueOf(d))
    case f: Float => canon(f.toDouble)
    case a: java.sql.Array =>
      a.getArray.asInstanceOf[Array[AnyRef]].map(canon).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case other => other.toString
  }

  private def sparkRows(name: String): (Seq[String], Seq[Seq[String]]) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.toSeq
    val order = cols.indices.sortBy(cols(_))
    (order.map(cols), df.collect().toSeq.map(r => order.map(i => canon(r.get(i)))))
  }

  private lazy val duck = {
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    val st = conn.createStatement()
    tables.foreach { t =>
      st.execute(s"CREATE VIEW $t AS SELECT * FROM read_parquet('$sfDir/$t.parquet')")
    }
    conn
  }

  private def duckRows(sql: String): (Seq[String], Seq[Seq[String]]) = {
    val rs = duck.createStatement().executeQuery(sql)
    val md = rs.getMetaData
    val n = md.getColumnCount
    val cols = (1 to n).map(md.getColumnName)
    val order = cols.indices.sortBy(cols(_))
    val rows = mutable.ArrayBuffer[Seq[String]]()
    while (rs.next()) {
      val raw = (1 to n).map { i =>
        md.getColumnType(i) match {
          case Types.TIMESTAMP => rs.getObject(i)
          case _ => rs.getObject(i)
        }
      }
      rows += order.map(i => canon(raw(i)))
    }
    (order.map(cols), rows.toSeq)
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    SparkEntry.oracleSql.get(name) match {
      case Some(sql) =>
        test(s"$name matches DuckDB oracle") {
          val (scols, srows) = sparkRows(name)
          val (ocols, orows) = duckRows(sql)
          assert(scols.map(_.toLowerCase) == ocols.map(_.toLowerCase),
            s"column mismatch: spark=$scols oracle=$ocols")
          assert(srows.size == orows.size,
            s"row count: spark=${srows.size} oracle=${orows.size}")
          srows.zip(orows).zipWithIndex.foreach { case ((s, o), i) =>
            assert(s == o, s"row $i differs:\n  spark =$s\n  oracle=$o")
          }
        }
      case None =>
        test(s"$name (no oracle) returns rows") {
          val df = SparkEntry.queries(name)(spark, sfDir)
          assert(df.count() > 0)
        }
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has stable non-empty schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name has empty schema")
    }
  }
}
