ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "avroparquetsparkexamplespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // In-JVM oracle for the correctness suite (pre-warmed in the cache).
  "org.duckdb" % "duckdb_jdbc" % "1.0.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap clamp (r08, VERDICT r07 #1a): the r07 driver bench ran an 86 GiB
// heap through this env override (heap_gb:86 in BENCH_r07.json vs 15 in
// every clean capture) and failed the gate with six spikes that all
// retimed clean. On a 125 GiB box a ~96g -Xms PRE-COMMIT squeezes the OS
// page cache that 152 re-read-per-query parquet scans live on, and
// full-heap ParallelGC collections scale with heap size. The override
// stays honored up to 32g for local experimentation; above that it is
// clamped (Bench additionally records heap_gb + heap_divergent so a
// bypassed clamp is still visible in the JSON). Unparseable values fall
// through unchanged — an experiment like -Xmx17000m stays possible.
val clampHeap: String => String = { req =>
  val GiB = "(?i)^\\s*(\\d+)\\s*g\\s*$".r
  val MiB = "(?i)^\\s*(\\d+)\\s*m\\s*$".r
  req match {
    case GiB(n) if n.toLong > 32 => "32g"
    case MiB(n) if n.toLong > 32768 => "32g"
    case _ => req
  }
}
val benchHeap = clampHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Duser.timezone=UTC",
  // 141 queries share one JVM in Bench/Verify — headroom keeps late-run GC
  // pressure from inflating per-query timings (host has 128 GiB). Pinning
  // -Xms to -Xmx removes heap-resize stalls mid-suite, and ParallelGC
  // trades pause latency (irrelevant for a batch suite) for ~20% less GC
  // CPU than G1 on this allocation profile — both are the standard Spark
  // batch-job JVM settings, measured A/B on the full bench (r06-late).
  s"-Xmx$benchHeap",
  s"-Xms$benchHeap",
  "-XX:+UseParallelGC",
)
