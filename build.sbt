ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sccrawlerspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the host has 128 GiB, and at 8g the bench measured GC
  // instead of plans — once ~17 queries' broadcast blocks and codegen
  // classes accumulated, every subsequent query ran 2-11× slower purely
  // from allocation pressure (r5 bisection: same 21-query prefix, 17.4 s
  // at 8g vs 8.8 s at 24g, calibration clean in both).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // JDK 17 reserves 240 MB of JIT code cache by default; the 172-query
  // bench suite compiles ~190 MB of generated code (measured via
  // -XX:+PrintCodeCache), saturating the profiled-nmethods segment
  // mid-suite — the JIT then throttles/flushes and codegen-heavy queries
  // run 4-5× slow with CLEAN cpu calibrations (round-10 bisection: c3
  // 8.4 s → 1.8 s, suite 153 s → 141 s from this flag alone). 1g is
  // reserved address space, not RAM.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").map(_.split(" ").toSeq).getOrElse(Seq.empty)
