ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "barberinianalyticsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// UTF-8 filesystem paths: the reference's own fixture files carry
// umlauts in their NAMES (tests/test_data/gomus/events/"Öffentliches
// Gespräch_in.csv"). sun.jnu.encoding is derived from the LOCALE at JVM
// start (a -D is ignored), so the forked JVMs need a UTF-8 locale or
// java.nio refuses to even construct the Path.
Test / envVars ++= Map("LC_ALL" -> "C.utf8")
run / envVars ++= Map("LC_ALL" -> "C.utf8")
run / fork := true
// Pass the forked program's stdout straight through: the bench/verify
// drivers parse a bare JSON line, which sbt's logger would prefix with
// "[info] " otherwise.
run / outputStrategy := Some(StdoutOutput)
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
  "-Dfile.encoding=UTF-8",
  // Fixed-size heap + ParallelGC. This host zeroes fresh pages
  // pathologically slowly (~100 MB/s serial), so ANY walk into uncommitted
  // heap (G1 growing, G1 recommitting regions it gave back) stalls
  // allocation ~100x — round-1 bench queries swung 2 s <-> 350 s from this
  // alone. ParallelGC never uncommits, so each page faults in at most
  // once; Xms=Xmx keeps the generation sizes stable; Bench additionally
  // faults the heap in with a 32-way parallel touch before timing
  // (serial AlwaysPreTouch would cost minutes here).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+UseParallelGC",
  // Whole-stage codegen emits one or more classes per query stage; a
  // 60-query run overflows the default 240 MB code cache, silently
  // disabling JIT mid-run (late queries then execute interpreted, 10-50x
  // slower). Size it for the full catalog and let it flush.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
