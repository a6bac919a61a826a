ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aindhcrdatatransformationspark"
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
// sbt's logger decorates forked-process stdout with "[info] " — which is
// what defeated the driver's bench-contract parser five rounds running
// (BENCH_r06..r10 "parsed": null): the contract line was valid JSON but
// arrived as `[info] {...}`. StdoutOutput passes the forked JVM's stdout
// through unprefixed so the line starts with '{'. Scoped to `run` (runMain
// delegates to run's runner/forkOptions); `sbt test` output keeps its
// framing for scripts/test_summary.py.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The full gate surface (120 queries x warmup + 3 timed passes) JIT-compiles
  // ~42k nmethods; measured occupancy at the default 240 MB reserve is
  // ~133 MB (55%, -XX:+PrintCodeCache, compilation never disabled), which
  // leaves little margin for longer multi-pass runs. 1 GiB is reserved
  // virtual address space, not resident memory, so the only cost is VA.
  "-XX:ReservedCodeCacheSize=1g",
  // 32 executor threads doing JNI-critical parquet/zstd reads hold the
  // GCLocker while sort stages request 128 MB humongous buffers; JDK 17's
  // default of TWO allocation retries under GCLocker contention then
  // throws a SPURIOUS OutOfMemoryError with most of the heap free
  // (JDK-8192647 class; observed killing the sf10 d14 batch, r19:
  // "Retried waiting for GCLocker too often allocating 16777218 words").
  // Raising the retry count only changes behavior in that starvation
  // race — zero steady-state cost.
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
