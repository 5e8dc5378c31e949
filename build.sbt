ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "foglampfilterpython35spark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites run SEQUENTIALLY in the forked test JVM — by construction, not
// convention: BenchMode's demo-depth flag is a process-global sys.prop
// that Round17Spec flips mid-suite (set/finally-restore), so a parallel
// suite schedule could observe reduced depth in a correctness stream.
// testForkedParallel already defaults to false; pin it so a future sbt
// or build edit cannot silently turn suite parallelism on.
Test / testForkedParallel := false
run / fork := true
// Forked run inherits raw stdout (no "[info] " logger prefix) — the driver
// json-parses Bench's output line, and the prefix breaks that.
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
  // 225 codegen-heavy queries in one JVM overflow JDK 17's default ~240 MB
  // JIT code cache mid-run; the compiler shuts off and every LATER query
  // silently runs deoptimized. Measured on an idle box (round 10): the full
  // bench read 190.8 s with the default and 121.6 s with 512 MB, with the
  // late-alphabet queries inflated 4-10x (q168 9.2 s -> 0.96 s, q187
  // 4.3 s -> 0.96 s) — the direct cause of round 9's "ambient inflation".
  "-XX:ReservedCodeCacheSize=512m",
)
// Pin the initial heap to the max on the RUN (bench) JVMs only: with -Xmx
// alone the heap grows lazily from ~512 MB, and the first big
// materialization wave pays the region commits + growth GCs — measured r16
// as the FIRST timed leg of a multi-leg bench reading 3-5x slower than an
// identical leg run later in the same JVM (the r15 "shuffle beats
// broadcast" coreness ordering was this artifact, not a join-strategy
// fact). Scoped to run/ so test JVMs stay on lazy growth: an unscoped -Xms
// would commit 8 GB per forked test JVM at launch, which can fail outright
// on a loaded box (r16 ADVICE #3) — tests assert correctness, not timing.
run / javaOptions += s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
