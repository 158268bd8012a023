ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sigmod2024contestspark"
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
// The band-sequential miners pause between passes so the shuffle-file
// cleaner can reclaim scratch (a 100M-doc concern); specs mine toy data
// where lingering files are KBs, so skip the ~2 s/pass dead time there.
Test / envVars += "GRAFT_BAND_PASS_GC_MS" -> "0"
// Pass forked-run output straight through to stdout: the bench/verify
// drivers parse the one-line JSON the mains print, and sbt's default
// logger would prefix it with "[info] ".
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
// Panama Vector API for the ANN index kernels (scalar fallback if absent).
// javaHome forces a forked javac — the in-process compiler cannot load
// incubator modules.
Compile / javacOptions ++= Seq("--add-modules", "jdk.incubator.vector", "-encoding", "UTF-8")
Compile / compile / javaHome := Some(file(sys.props("java.home")))
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // dev A/B knob for the executor-resident graph cache (bytes budget).
  // Only forwarded when explicitly set: a hardcoded default here would
  // override the code's heap-adaptive maxMemory/8 clamp and could claim
  // up to half the heap under a small SPARK_DRIVER_MEM.
  sys.env.get("GRAFT_HNSW_CACHE_BYTES").map(b => s"-Dgraft.hnsw.cacheBytes=$b").toSeq ++
  // extra forked-JVM flags for the scale probes (e.g. the 10M contest
  // runs need -XX:MaxDirectMemorySize=20g -Djdk.nio.maxCachedBufferSize=
  // 262144 — BASELINE.md Run B notes); space-separated, optional.
  sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
