ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "corralspark"
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
// keep `sbt run` stdout ending on the program's own last line: the
// round harness parses the LAST stdout line of graft.Bench as JSON,
// and sbt's "[success] Total time: ..." banner otherwise lands after it
Global / showSuccess := false
// ... and write the forked process's stdout through unchanged instead
// of routing it through sbt's logger, which prefixes every line with
// "[info] " (a last-line JSON parse chokes on the prefix too)
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
) ++
  // SPARK_GRAFT_JVM_CONFS="spark.a=1,spark.b=2" → -Dspark.a=1 ... :
  // SparkConf reads spark.* system properties, so measurement mains can
  // run A/B legs (e.g. sizing guards off) without code changes.
  // Empty segments (trailing comma) are dropped — a bare "-D" aborts the
  // JVM; comma-CONTAINING values are rejected loudly instead of being
  // silently mangled into bogus flags (the split has no escape syntax).
  sys.env.get("SPARK_GRAFT_JVM_CONFS").toSeq
    .flatMap(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    .map { kv =>
      require(kv.contains("="),
        s"SPARK_GRAFT_JVM_CONFS segment '$kv' is not key=value — " +
          "comma-separated list; values containing commas are unsupported")
      s"-D$kv"
    }
// suites share one SparkSession and a few tests toggle session confs
// (AQE, broadcast threshold) — run suites sequentially for determinism
Test / parallelExecution := false
// LambdaSimSpec builds its own SparkContext on --master lambda://local-sim
// (one context per JVM), so it runs in a separate forked test JVM;
// sbt's default ForkedTestGroup limit of 1 keeps groups sequential
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val (sim, rest0) = (Test / definedTests).value
    .partition(_.name.contains("LambdaSim"))
  // the shuffle suites set spark.shuffle.manager — a static conf — so
  // they own their SparkContexts in a JVM of their own too
  val (shuffle, rest) = rest0.partition(_.name.contains("GraftShuffle"))
  Seq(
    Tests.Group("lambda-sim", sim, Tests.SubProcess(forkOpts)),
    Tests.Group("graft-shuffle", shuffle, Tests.SubProcess(forkOpts)),
    Tests.Group("main", rest, Tests.SubProcess(forkOpts)))
}
