ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqletldatawarehouseinsideairbnbspark"
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
// The forked program's stdout must reach sbt's stdout RAW: the default
// LoggedOutput strategy prefixes every line with "[info] ", which breaks
// any driver that json.loads the benchmark's one-line JSON output
// (BENCH_r01/r02 both had parsed:null with "[info] {...}" in the tail).
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
  // 195 codegen'd queries × (cold + warm) load thousands of generated
  // classes in one JVM; the default 240 MB reserved code cache fills
  // mid-suite and the JIT stops compiling the tail's hot loops — measured
  // +7 s on the sf0.1 bench total at 240 MB vs 512 MB in round 6, and in
  // round 12 a 240 MB standalone run showed 10-19 s deopt-storm spikes on
  // q_corpus_pipeline (watchdog stack dumps caught Pattern.compile and the
  // shingle kernel running INTERPRETED) that 1 GB eliminates. Reservation
  // is virtual — headroom costs nothing. Irrelevant on a real cluster
  // (one long-lived session, executors JIT their own paths); this keeps
  // the LOCAL suite measuring query cost, not code-cache eviction.
  // Standalone `java -cp` invocations MUST pass the same flag or their
  // numbers are not comparable to the driver's sbt-forked runs.
  "-XX:ReservedCodeCacheSize=1g",
)
