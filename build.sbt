ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rangerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
run / connectInput := true  // forward stdin to forked mains (Repl)
// Forked mains write to the REAL stdout/stderr, not through sbt's
// logger: the round driver json-parses Bench's one-line result, and
// the logger's "[info] " prefix made every line unparseable (every
// BENCH_r{N}.json shipped "parsed": null; PERF_r16.json compared 0
// queries). Bare stdout keeps `grep metric` working AND makes the
// line valid JSON from column 0.
run / outputStrategy := Some(StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 48g default on the 128 GiB host: an 8g heap put the local[32]
  // driver+executors under GC pressure during the 8-way concurrent
  // bench (the whole engine lives in one JVM in local mode)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~90 whole-stage-codegen'd queries x 2 bench passes overflow the
  // default 240m JIT code cache; once it fills the compiler shuts off
  // and the second concurrent pass runs interpreted (observed 3.6s ->
  // 14.9s walls). Size it so compiled code is never evicted.
  "-XX:ReservedCodeCacheSize=512m",
)
