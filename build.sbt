ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nhl_data_warehousespark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the single
// JSON line Bench prints. Two things broke that in rounds 1-2:
// (1) sbt's default LoggedOutput prefixes forked stdout with "[info] ",
// (2) sbt's "[success] Total time..." trailer pushed the (long) JSON
// line out of the driver's bounded tail capture. StdoutOutput passes
// the child's stdout through verbatim; showSuccess drops the trailer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pin the initial heap AND pre-touch it at JVM startup: on this VM
  // the first allocation sweep through a large G1 young gen pays
  // first-touch page zeroing INSIDE the measured phases (adjacency
  // checkpoint at -Xmx48g measured 66-99 s on first run vs ~2 s at
  // -Xmx8g; second runs 11-20 s) — AlwaysPreTouch moves that cost to
  // startup, where benches don't time it
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
