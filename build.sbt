ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "alignedspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// DEPLOY NOTE — connectors intentionally NOT declared here because this
// build is zero-egress (COURSIER_MODE=offline would fail resolution, even
// at "provided" scope). On a cluster add:
//   "org.apache.spark" %% "spark-sql-kafka-0-10" % <sparkVersion>   // Streaming.kafkaJsonStream
//   "io.delta" %% "delta-spark" % <deltaVersion>                    // sources.DeltaSource
//     + spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension
//     + spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog
//   "org.apache.iceberg" %% "iceberg-spark-runtime-4.0" % <ver>     // sources.IcebergSource
//     + spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
//     + a spark.sql.catalog.<name> Iceberg catalog binding
// KafkaSmokeSpec / DeltaSourceSpec gate what is checkable offline and
// cancel cleanly when the jars are absent.
Test / fork := true
run / fork := true
// The bench driver parses the LAST stdout line as JSON out of a bounded
// tail window. Under sbt's default LoggedOutput every forked-process line
// arrives prefixed "[info] ", so the final JSON line starts with
// "[info] {" and the parse fails (the one round it ever parsed, the tail
// truncation happened to chop the prefix off). StdoutOutput passes the
// forked JVM's stdout/stderr through raw — the JSON line genuinely starts
// with '{'. Logging noise (Spark WARNs) goes to stderr either way.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
)
