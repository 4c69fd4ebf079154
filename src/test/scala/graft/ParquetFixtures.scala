package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame

/** Test-fixture writer: a single parquet FILE at `dir/<table>.parquet` —
  * the exact layout the driver's testdata uses (one file, not a Spark
  * output directory), so Tables.table and Tables.eventsStream (whose
  * pathGlobFilter matches leaf file names) see fixtures the way they see
  * the real data. */
object ParquetFixtures {
  def writeSingleFile(df: DataFrame, dir: Path, table: String): Unit = {
    val staging = dir.resolve(s"_stage_$table")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, dir.resolve(s"$table.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.walk(staging).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }
}
