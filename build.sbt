ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bikedataflowspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// sbt's JUnit XML reporter appends to target/test-reports and never
// removes entries for deleted suites — a stale XML then pads the report
// set. Wipe the dir as each test run starts so reports == live suites.
Test / testOptions += Tests.Setup { () =>
  sbt.IO.delete(file("target") / "test-reports")
}
// The bench driver parses the LAST stdout line as the JSON result line;
// sbt's trailing "[success] Total time: ..." banner lands after Bench's
// JSON and has made that parse fail every round. Suppress it (and the
// timing line) so the program's own final line is the last thing printed.
Global / showSuccess := false
Global / showTiming := false
// ...and un-prefix the forked run's stdout (the default LoggedOutput
// strategy wraps every line in "[info] ", which also breaks that parse).
run / outputStrategy := Some(StdoutOutput)
Global / excludeLintKeys ++= Set(showSuccess, showTiming, run / outputStrategy)
