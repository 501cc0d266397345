ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lorismrispark"
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
// Bench stdout contract (r13): the driver parses the LAST stdout line of
// `sbt "runMain graft.Bench"` as bare JSON. sbt's default LoggedOutput
// wraps every forked-process line in "[info] " and appends a
// "[success] Total time..." trailer, so BENCH_r09–r12 all recorded
// `parsed: null`. StdoutOutput passes the forked stdout/stderr straight
// through (no prefix), and showSuccess drops the trailer — the compact
// summary Bench prints after spark.stop() is then the literal last
// stdout line. Logging-only: no timing or execution change.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // 32 g default: the box has 128 GiB and 32 cores; an 8 g heap with 32
  // concurrent tasks flips array-heavy stages into eviction/GC storms
  // (measured 15 s -> 205 s on the same query)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
