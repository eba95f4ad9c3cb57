ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "frauddetectioninbankingtransactionsusinghadoopspark"
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
// Pass the forked program's stdout straight through (no "[info] " prefix):
// the driver harness parses Bench's one-line JSON from raw stdout.
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
// Fan the suites across parallel forked JVMs: one JVM re-derives nothing
// (each group shares its lazy SparkSuite session), and the groups run
// concurrently — the box has 32 cores and each test session is local[4],
// so 6 groups fit with headroom. Suites were audited for cross-JVM
// safety: every on-disk fixture is a Files.createTempDirectory path and
// the warehouse dir is per-JVM (SparkSuite).
Test / testGrouping := {
  val groups = sys.env.getOrElse("GRAFT_TEST_GROUPS", "6").toInt
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / forkOptions).value
  if (groups <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(opts)))
  else
    tests.zipWithIndex.groupBy(_._2 % groups).toSeq.sortBy(_._1).map {
      case (i, ts) => Tests.Group(s"g$i", ts.map(_._1), Tests.SubProcess(opts))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, sys.env.getOrElse("GRAFT_TEST_GROUPS", "6").toInt))
