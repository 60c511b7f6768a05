package graft.lambda

import java.nio.file.Files

import org.apache.spark.graft.SchedulerBackdoor
import org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** F20 end-to-end: `--master lambda://<named-function>` SELF-DEPLOYS the
  * engine (corral's deploy-on-start, `/root/reference/driver.go:185-187`)
  * and runs a distributed job whose executors load the engine classes
  * from the DEPLOYED package — the driver's own code location is excluded
  * from every invocation's classpath, so a correct result proves the
  * deployed artifact is complete and live, not just written. Named
  * *LambdaSim* so build.sbt routes it to the forked lambda-sim test JVM
  * (this suite owns its SparkContext). */
class DeployLambdaSimSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val controlPlaneDir =
    Files.createTempDirectory("graft-e2e-control-plane-")
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master(LambdaClusterManager.SCHEME + "graft-e2e-fn")
      .appName("graft-deploy-e2e")
      .config(FaasDeploy.ControlPlaneDirKey, controlPlaneDir.toString)
      .config("spark.executor.instances", "1")
      .config("spark.executor.cores", "1")
      .config("spark.executor.memory", "700m")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "localhost")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def backend: LambdaSchedulerBackend =
    SchedulerBackdoor.backend(spark.sparkContext).asInstanceOf[LambdaSchedulerBackend]

  test("session start auto-deployed the function (create-or-update by SHA)") {
    val cp = new LocalDirControlPlane(controlPlaneDir)
    val fn = cp.getFunction("graft-e2e-fn").getOrElse(
      fail("auto-deploy did not publish the function"))
    // the stored package IS this build: SHAs must agree exactly
    assert(fn.codeSha256 ==
      Deployer.codeSha256(Deployer.buildPackage(Deployer.defaultCodeLocation())))
    // deploy-on-start managed the execution role and wired its ARN in
    assert(fn.config.roleArn == cp.getRole(Deployer.RoleName).get)
    // lease geometry flowed from the Spark conf
    assert(fn.config.memoryMb == 700)
  }

  test("job runs correctly on invocations that execute the deployed package") {
    val df = spark.range(0, 5000, 1, 4)
      .groupBy((col("id") % 7).as("k")).agg(sum("id").as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0L until 7L).toSet)
    assert(rows.values.sum == (0L until 5000L).sum)

    // the data plane really was the deployed-package client, and the
    // invocation classpath was sandbox-first with the driver's own code
    // location excluded — engine classes can only have come from the
    // deployed artifact
    val client = backend.faasClient.asInstanceOf[DeployedPackageFaasClient]
    val cpStr = client.lastClasspath
    assert(cpStr != null, "no invocation was launched through the deployed package")
    val entries = cpStr.split(java.io.File.pathSeparator)
    assert(entries.head.contains("graft-e2e-fn"),
      s"sandbox dir not first on the invocation classpath: ${entries.head}")
    val own = Deployer.defaultCodeLocation().getCanonicalPath
    assert(entries.tail.forall(e => new java.io.File(e).getCanonicalPath != own),
      "driver's own code location leaked into the invocation classpath")
  }

  test("a second session against the same control plane is an UpToDate no-op") {
    val cp = new LocalDirControlPlane(controlPlaneDir)
    val before = cp.getFunction("graft-e2e-fn").get
    val outcome = Deployer.deploy(cp,
      FunctionConfig("graft-e2e-fn",
        timeoutSeconds = before.config.timeoutSeconds,
        memoryMb = before.config.memoryMb),
      Deployer.buildPackage(Deployer.defaultCodeLocation()))
    assert(outcome == Deployer.UpToDate)
    assert(cp.getFunction("graft-e2e-fn").get == before)
  }
}
