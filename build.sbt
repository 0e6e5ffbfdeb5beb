ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automotivebigdataanalysisspark"
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
// Forked-run output goes straight to stdout, NOT through sbt's logger:
// Bench/Verify print a machine-readable JSON line that the harness
// parses, and the default logger's "[info] " prefix breaks that parse.
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
  // local-mode Spark: driver heap is the only memory knob; the bench box
  // has 128 GiB — a small heap makes late bench queries pay GC/broadcast
  // pressure accumulated by earlier ones.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // JIT code cache: local-mode bench JVMs execute EVERY query's
  // whole-stage-codegen classes in one process; at the default 240 MB
  // the cache fills after ~30 heavy-query executions, HotSpot stops
  // JIT-compiling, and codegen-hot queries degrade ~5x (r10: the
  // ext_semdedup 52s-vs-6s receipt mystery — SCALE.md "code cache").
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
