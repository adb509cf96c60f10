ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "faissspark"
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
// Driver bench contract (VERDICT r19 #1): the driver tails stdout of
// `sbt -batch "runMain graft.Bench"` and expects the slim JSON line as
// the LAST BARE line. With the default LoggedOutput strategy sbt
// prefixes every forked-process line with `[info] `, and after the run
// it prints its own `[success] Total time...` — the bench line never
// parsed in 19 rounds. StdoutOutput pipes the forked JVM's stdout
// through unprefixed; showSuccess drops the trailing [success] line.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // local[32] runs the whole executor inside this one JVM: the 8g JVM
  // default thrashes GC with 32 concurrent tasks (r02 bench collapse).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseG1GC",
  // The 149-query catalog compiles hundreds of large janino stages; the
  // JDK-17 default 240m code cache then hits UseCodeCacheFlushing, which
  // evicts warm nmethods and sends hot loops back through the
  // interpreter/C1 (the wandering 10-50x per-query stalls of the r06/r07
  // driver benches — 2006 deopts in one 50 s window). 1g keeps every
  // compiled stage resident for the whole session.
  "-XX:ReservedCodeCacheSize=1g",
)
