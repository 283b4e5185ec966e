ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandasvcfspark"
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
// r18 (r17 verdict #2): without this, sbt's forked-run logger prefixes
// every stdout line with "[info] ", so the driver wrapper's bounded
// tail parser never saw a line starting with '{' and BENCH `parsed`
// came back null two rounds running. StdoutOutput forwards the child's
// stdout verbatim; Bench's final minimal JSON line is then the last
// parseable line in the tail.
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
  // r18: the 236-gate bench generates ~14.6k codegen classes per run;
  // the JDK default 240 MB code cache sweeps/deoptimizes under that
  // churn and late-suite gates run partially interpreted (q230's
  // in-suite exec 4x its isolated exec with identical plans). 512 MB
  // keeps compiled code resident for the whole suite on a 128 GiB box.
  "-XX:ReservedCodeCacheSize=512m",
  // r18 second pass, MEASURED AND REVERTED: the instrumented suite
  // showed 755 s of JIT compile time, front-loaded, so
  // -XX:CICompilerCount=28 was tried to drain the C2 backlog the
  // q100–q152 kernel window stacks behind. Full suite measured FLAT
  // (359.8 s @15 threads vs 364.4 @28), and fresh targeted runs
  // REGRESSED ~1.5× (q111 2.07→3.46 s): 28 compiler threads + 32
  // executor threads oversubscribe the 32 vCPUs exactly when the
  // workload is compile-heavy. The default (15 here) stays; the env
  // override remains for future A/Bs.
  s"-XX:CICompilerCount=${sys.env.getOrElse("SPARK_GRAFT_CI_THREADS", "15")}",
  // 24g default (was 8g): the r14 residue instrumentation showed the
  // bench suite's post-sample heap sitting at a median 3.6 GB of the
  // 8 GiB ceiling with the pair-substrate gates leaving 5-7 GB — GC
  // time concentrated exactly there (own §8 advice: size old-gen so
  // the largest exchange leaves < 50% occupancy). On a 128 GiB box,
  // 24g drops suite GC 3-4x and wall 5-15% on the probed gates.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
