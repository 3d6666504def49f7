ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "marketpipespark"
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
// Every BENCH_r* capture to date has "parsed": null because sbt's logger
// prefixes the forked program's stdout with "[info] " and appends a
// "[success] Total time" line after it — the driver's tail parser never
// sees a raw JSON line. StdoutOutput passes the forked JVM's stdout
// through verbatim (no [info] prefix) and showSuccess drops the trailing
// [success] line, so Bench's compact summary is the last line of output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint
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
  // Xms = Xmx: an undersized initial heap makes allocation-heavy rows
  // grind full GCs while the heap slowly expands toward Xmx — measured
  // at sf10 as 2-5x swings on identical back-to-back runs (d13 386s /
  // 75s / 67s in one JVM). A fixed-size heap is also how a real
  // executor runs (spark.executor.memory is both bounds).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Ad-hoc flags for A/B measurement runs (e.g.
// SPARK_GRAFT_JAVA_OPTS="-Dspark.graft.sortFrontier.enabled=false"):
// forked mains read spark.* system properties into the session conf.
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
