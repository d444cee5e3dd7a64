ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "miespark"
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
// r17 (bench contract): the driver's BENCH_r{N}.json keeps only the
// last ~2 KB of `sbt "runMain graft.Bench"` output and parses the
// final line as JSON. sbt's default LoggedOutput prefixes every
// forked-stdout line with "[info] " and appends a "[success] Total
// time" footer, so the bench's compact JSON line was never a clean
// last line (parsed:null since r10). Raw passthrough + no success
// banner make the compact line the literal last thing printed.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // SPARK_GRAFT_GC_LOG=<path>: JVM GC log for the forked run — the
  // measurement knob behind the r16 heap-sizing A/B (multi-second
  // single-pass spikes in the bench correlate with full-GC stalls
  // when the 32-task local-mode driver runs tight at -Xmx8g).
  sys.env.get("SPARK_GRAFT_GC_LOG").map(f => s"-Xlog:gc:$f").toSeq ++
  // SPARK_GRAFT_JAVA_OPTS: extra JVM flags for the forked run —
  // lets a replay inject session confs (e.g.
  // -Dspark.graft.checkpoint.reliable=true for the r16 suite-wide
  // reliable-checkpoint validation) without editing the mains.
  // Debug knob limitation (r16 advice): split on whitespace with no
  // quoting support, so a flag VALUE cannot contain spaces.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
