ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "samplepythonlambdasglueandpysparkscriptsspark"
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
// Pass forked-run output through unprefixed: Bench/Verify print a
// machine-parsed JSON line, and sbt's default logger would prefix it
// with "[info] " (which broke the round-1 bench parse — BENCH_r01.json
// recorded parsed:null).
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
scalacOptions ++= Seq("-Wunused:imports")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: at 345 gates × 3 runs the one-JVM bench suite left an
  // 8g old-gen nearly full by the late-alphabet gates — the streaming
  // tail measured ~3× its isolated wall purely from GC churn (r8
  // closing-session finding; early-alphabet gates matched r7 at 1.03×).
  // The machine budget is 128 GiB; 16g restores flat per-gate timing.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // headroom for ~345 gates' worth of generated classes (no warning
  // observed at 240m, but the suite sits close to the default ceiling)
  "-XX:ReservedCodeCacheSize=512m",
)
