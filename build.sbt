ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqloadspark"
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
// Suites share one SparkSession (getOrCreate) and several of them
// (GraphPassSpec, benches' release helpers) blanket-unpersist persistent
// RDDs — under parallel suite execution that could destroy another
// suite's local-checkpointed (lineage-truncated, unrecoverable) blocks
// mid-test. Forked tests already run suites sequentially in one JVM by
// default (testForkedParallel = false), but pin BOTH knobs explicitly so
// a build-setting change can never silently re-enable the race.
Test / parallelExecution := false
Test / testForkedParallel := false
// The driver parses graft.Bench's one-line JSON out of sbt's combined
// output. r03 came back parsed=null even though the line was present and
// valid — sbt's "[info] " logger prefix and "[success] Total time" epilogue
// were in the way. Pass forked stdout through verbatim and drop the
// epilogue so the JSON line is the literal last line of output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
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
  // 205 queries × whole-stage-codegen classes × (warm-up + 2 timed runs)
  // churn through the JDK-17 default 240 MB reserved code cache; once it
  // fills, JIT compilation stalls/flushes and queries run 2-3× slower in
  // sustained stretches (the r9 "regressions" on unchanged plans —
  // SCALE.md §bench-noise). 512 MB keeps the full inventory compiled.
  "-XX:ReservedCodeCacheSize=512m",
  // r18 saw ONE transient forked-JVM exit-56 crash after a fully green
  // suite run (native teardown, unreproduced across three clean runs);
  // if it ever recurs, capture the JVM error file instead of shrugging
  "-XX:ErrorFile=/tmp/graft_hs_err_pid%p.log",
) ++ sys.env.get("GRAFT_EXTRA_JVM_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
// The r18 exit-56 DID recur (round 20, twice, full stack captured):
// exit 56 IS Spark's "Exit as unable to send heartbeats to driver more
// than 60 times". Mechanism: a startup race drops the local executor's
// HeartbeatReceiver registration, the first heartbeat answers
// "re-register", and in local mode re-registration can NEVER succeed —
// BlockManagerMasterEndpoint.register → isExecutorAlive looks up the
// CoarseGrainedScheduler endpoint, which does not exist under local[*]
// (RpcEndpointNotFoundException, seen in the captured trace). 60
// consecutive failures × 10 s later the executor System.exits the
// forked JVM mid-suite and every later getOrCreate dies on the stopped
// context. Executor self-exit protects nothing in a single-JVM test
// run (the driver IS the executor), so disable the suicide threshold
// for forked TEST JVMs only; cluster posture is unaffected.
Test / javaOptions += "-Dspark.executor.heartbeat.maxFailures=1000000"
