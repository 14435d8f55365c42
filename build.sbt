ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tpctoolsspark"
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
// The bench/verify harness json-parses the LAST stdout line of
// `sbt "runMain graft.Bench"`. Two sbt default behaviors break that:
// the forked process's output is re-logged with an "[info] " prefix
// (LoggedOutput), and sbt appends a "[success] Total time: ..." line
// after the main returns. StdoutOutput passes the child's stdout
// through verbatim; showSuccess drops the trailing banner, so the
// bench's compact summary line is the literal last line of stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command loop, not a task — exclude it from
// the unused-key lint so the warning doesn't pollute harness-parsed output
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
) ++
  // config A/B harness: semicolon-separated spark confs injected as system
  // properties (SparkSession.builder reads spark.* properties), e.g.
  // SPARK_GRAFT_CONF="spark.sql.join.preferSortMergeJoin=false" — lets a
  // candidate setting be measured on the unmodified bench before being
  // baked into a session builder
  sys.env.get("SPARK_GRAFT_CONF").toSeq.flatMap(_.split(";"))
    .map(_.trim).filter(_.nonEmpty).map("-D" + _)
