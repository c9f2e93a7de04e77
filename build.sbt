ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "confluentkafkastreamsexamplesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// All suites share one local SparkSession; catalog/conf mutations (bucketed
// tables, streaming state-store conf) race under sbt's default parallel
// suite execution — run suites sequentially.
Test / parallelExecution := false
run / fork := true
// The driver tail-captures stdout of `sbt runMain graft.Bench` and parses
// the LAST line as the round's bench record. Two sbt defaults broke that
// every round: forked output is re-logged with an "[info] " prefix, and
// sbt appends its own "[success] Total time" line after the JSON. Pass
// child stdout through verbatim and drop the success banner so the final
// stdout line IS the machine-readable JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command layer, not a task — exclude it from
// the unused-key lint so every sbt invocation stays warning-free
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // G1's GCLocker gives an allocation up after TWO failed retries while any
  // thread holds a JNI critical region (JDK-8192647). With 32 task threads
  // doing lz4 cache compression (GetPrimitiveArrayCritical) a multi-MB
  // array allocation — a broadcast build, a TaskMemoryManager page — fails
  // SPURIOUSLY under load: observed at 64×-scale/8 GiB as "Retried waiting
  // for GCLocker too often" followed by a fake broadcast/page OOM with heap
  // to spare. Raising the retry budget removes the false failure; a truly
  // full heap still OOMs promptly.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
) ++
  // Experiment knob (default absent = behavior unchanged): AQE's initial
  // shuffle-partition count before coalescing. At ≥64× corpus scale the
  // fixed 32 shuffle partitions make single sort tasks large enough to
  // request 512 MB pointer-array doublings (transient retries observed on
  // green 64× runs); a higher initial count splits those sorts while AQE
  // coalesces small stages back, which is exactly the production setting
  // on a real cluster. Measured before any default change.
  sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS").map(n =>
    s"-Dspark.sql.adaptive.coalescePartitions.initialPartitionNum=$n").toSeq
