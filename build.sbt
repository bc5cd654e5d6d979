ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "relspark"
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
// Default heap 12g: plenty for every sf0.1 surface (bench + verify +
// 130k-turn pipeline measured < 8g resident), and the fixed pre-touched
// heap below costs ~linear-in-size at JVM start — 32g was measured
// charging ~47 s to the first query vs ~0 at 12g. Big corpora (the 26M-
// turn ScalingBench runs) pass SPARK_DRIVER_MEM=40g explicitly.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
)
// JVM shape for `runMain` (Bench/Verify/Demo/ScalingBench): this sandbox
// is a microVM kernel where first-touch minor faults serialize on
// mmap_lock — a growing G1 heap that also uncommits regions re-faults
// pages constantly (measured: 89% SYSTEM time, 360M minor faults, a
// 26M-turn pipeline run at 551 s that drops to 95 s with this shape).
// Fixed pre-touched heap + ParallelGC (no uncommit, throughput collector)
// pays the fault cost once at JVM start, outside any timed window. Tests
// keep the default fast-startup heap. Opt out: SPARK_GRAFT_NO_PRETOUCH=1.
run / javaOptions ++= (
  if (sys.env.contains("SPARK_GRAFT_NO_PRETOUCH")) Seq.empty
  else Seq(s"-Xms$driverMem", "-XX:+AlwaysPreTouch", "-XX:+UseParallelGC")
)
