ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbtslabbingspark"
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
// Driver-parser fix (round 12, third consecutive "parsed": null): the
// driver tail-captures the last 2000 chars of `sbt runMain graft.Bench`
// stdout and tries to parse a JSON summary line. Two sbt decorations
// defeated it: (a) forked-process stdout is logged with an "[info] "
// prefix by default, so the summary line never starts with '{'; (b) the
// "[success] Total time" banner prints after it as the true last line.
// StdoutOutput passes the forked JVM's stdout through verbatim, and
// showSuccess drops the banner — so Bench's compact summary is the
// literal last line of stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // JDK-17 G1 GCLocker starvation workaround (round 12): three 100×
  // fleet passes died at the shuffle-heaviest query with
  // "[gc,alloc] Retried waiting for GCLocker too often" followed by a
  // SPURIOUS OutOfMemoryError (heap had room; allocation failed because
  // 32 concurrent tasks' JNI critical sections — shuffle compression
  // codecs — starved the GC lock). The standard mitigation: retry the
  // GCLocker-blocked allocation more times before surfacing OOM
  // (diagnostic flag on JDK 17, hence the unlock).
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
  // Round 14: Bench calls System.gc() at canary points (and Spark's
  // ContextCleaner periodicGC every 45 s) to drain weak-ref'd
  // broadcast/RDD state steadily. This flag turns those explicit calls
  // into CONCURRENT G1 cycles instead of stop-the-world full
  // collections, so the drain cannot itself stall a timed query.
  "-XX:+ExplicitGCInvokesConcurrent",
)
