package graft.lambda

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The `--lambda` CLI path end to end: `graft.Main.lambdaBuilder` builds
  * a session whose master is the configured function, the cluster
  * manager auto-deploys this build on start, and the reference's
  * wordcount behavior test (`/root/reference/driver_test.go:82-116`)
  * runs on the FaaS backend with the exact same artifact contract as
  * the local run in MainSpec — corral's `--lambda` flag semantics
  * (`driver.go:246-249`) composed with F20. Named *LambdaSim* so
  * build.sbt routes it to the forked lambda-sim JVM (owns its
  * SparkContext; suites there run sequentially, each stopping its
  * session). */
class MainLambdaSimSpec extends AnyFunSuite {

  test("Main --lambda: wordcount e2e on a self-deployed FaaS backend") {
    val controlPlane = Files.createTempDirectory("graft-cli-control-plane-")
    val gconf = graft.GraftSession.Conf(
      maxConcurrency = 4,
      faasFunction = "graft-cli-fn",
      faasControlPlane = Some(controlPlane.toString))
    val spark = graft.Main.lambdaBuilder(gconf)
      .appName("graft-cli-lambda")
      .config("spark.executor.instances", "1")
      .config("spark.executor.cores", "1")
      .config("spark.executor.memory", "700m")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val tmp = Files.createTempDirectory("graft-cli-lambda-").toFile
      Files.writeString(tmp.toPath.resolve("test_input"),
        "the test input\nthe input test\nfoo bar baz")
      val outDir = tmp.toPath.resolve("out").toFile
      val conf = graft.Main.parseArgs(Seq("--lambda", "--job", "wordcount",
        "-o", outDir.toString, tmp.toPath.resolve("test_input").toString))
      assert(conf.lambda)
      graft.Main.run(spark, conf)

      val kvs = outDir.listFiles().filter(_.getName.startsWith("output-part-")).toSeq
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
        .map { l => val s = l.split("\t"); (s(0), s(1)) }
      assert(kvs.toSet == Set(
        "the" -> "2", "test" -> "2", "input" -> "2",
        "foo" -> "1", "bar" -> "1", "baz" -> "1"))

      // the run really went through deploy-on-start
      val cp = new LocalDirControlPlane(controlPlane)
      assert(cp.getFunction("graft-cli-fn").isDefined)
    } finally spark.stop()

    // corral's `--undeploy` completes the lifecycle from the same conf
    assert(graft.Main.undeploy(gconf) == (true, true))
  }
}
