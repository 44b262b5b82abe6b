ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "socialgraphbasedpeoplerecommenderusingamazonneptuneandtextractspark"
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
// Forked run output passes through un-prefixed: the bench/verify harness
// contract is ONE parseable JSON line on stdout, and sbt's default
// LoggedOutput would wrap it as "[info] {...}" (unparseable downstream).
run / outputStrategy := Some(StdoutOutput)
// sbt stages the FULL run classpath (~400 MB of Spark jars) under
// bg-jobs for every forked `runMain`; on this box's throttled virtual
// disk that writeback collides with the timed passes' parquet reads
// (measured: 60-95 MB/s write bursts while Spark stages sit 80-90%
// idle — the long-suspected "machine noise" of the bench harness).
// Stage it on tmpfs instead; jar copies then never touch the disk.
bgJobServiceDirectory := {
  val shm = file("/dev/shm")
  if (shm.isDirectory) shm / "sbt-bg-jobs" else target.value / "bg-jobs"
}
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// ExtensionsSpec must own its JVM: spark.sql.extensions is a STATIC
// conf that Spark reads from the SparkContext's conf at session build —
// in a JVM where another suite already created the (extension-less)
// context, the injection is silently skipped and the spec fails. A
// dedicated forked group gives it a fresh context, so the config-driven
// deploy path is genuinely exercised on every full-suite run.
Test / testGrouping := {
  val forkOpts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (ext, rest) = (Test / definedTests).value
    .partition(_.name == "graft.ExtensionsSpec")
  Seq(
    Tests.Group("extensions", ext, Tests.SubProcess(forkOpts)),
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
