ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "embarrassinglyparallelimageclassificationspark"
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
// Pass the forked run JVM's stdout through verbatim: the default
// LoggedOutput strategy prefixes every line with "[info] ", which breaks
// the driver's JSON parse of Bench's final {"metric":"total",...} line.
// Scoped to run only so forked Test output keeps sbt's log buffering.
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
  // GC selector: G1 (the JDK default, stated explicitly). Round 15 tried
  // UseParallelGC as the default after a local A/B, but on the grading
  // host it blew sweep GC time up ~200x (1.8 s -> 364 s), regressed the
  // dedup cold path 8.7x and killed the test/verify run mid-suite — a
  // local-mode JVM knob that did not generalize. SPARK_GC stays as an
  // explicit opt-in override only; see OPTIMIZATION_r16.md.
  s"-XX:+${sys.env.getOrElse("SPARK_GC", "UseG1GC")}",
)
