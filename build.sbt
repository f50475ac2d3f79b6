ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scalableetlspark"
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
// Pass forked-run stdout through raw (no [info] prefix) so Bench's JSON
// line stays machine-parseable when invoked via sbt.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time" trailer: Bench's compact JSON contract line
// must be the LAST stdout line the driver sees (round-7 advice item 1).
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
  // STATIC SQL conf (round-6 advice): set it on the launch command line so
  // it binds no matter which code path constructs the JVM's first session;
  // SparkConf loads every spark.* system property at construction.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
  // local[32] on a 128 GiB box: 24g keeps the persisted silver/shingle/tf
  // frames + shuffle buffers comfortably in heap (8g showed GC pressure
  // when several persist-heavy dedup queries ran in one bench session)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
