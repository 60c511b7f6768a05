package graft.shuffle

import java.nio.file.Files

import graft.operators.DailyPipeline
import graft.lambda.LambdaClusterManager
import org.apache.spark.graft.SchedulerBackdoor
import org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The deployment dress rehearsal (round-11 task #4): the composed
  * daily-increment pipeline — p4's exact verb sequence (seed assets →
  * ingest → dd7 pairs → dd10 groups → upsert → compact → keep/drop) —
  * running on the ACTUAL north-star configuration: a SELF-DEPLOYED
  * function (F20: the session packages this build and publishes it to
  * the control plane on start, corral's deploy-on-start,
  * `/root/reference/driver.go:185-187`) whose leased process executors
  * (F18, `/root/reference/lambda.go:100-145` rescheduling parity) run
  * the DEPLOYED package — the driver's own code location is excluded
  * from every invocation's classpath — with the object-store shuffle
  * manager (corral's S3 shuffle, `emitter.go:90-120`), one invocation
  * killed mid-pipeline.
  *
  * What the kill exercises, composed: task rescheduling onto the
  * surviving lease, `supportsReliableStorage` keeping the dead
  * invocation's map output readable from the shared FS (no map-stage
  * re-run), `persist`-mode barriers recomputing lost cache blocks from
  * lineage, and the asset lifecycle's overwrite-idempotent writes —
  * the result must be byte-equal to the clean run.
  *
  * Own SparkContext (lambda master + static shuffle-manager conf), so
  * it lives in the forked `graft-shuffle` JVM group (build.sbt). */
class GraftShuffleDailyRehearsalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val controlPlaneDir =
    Files.createTempDirectory("graft-dress-control-plane-")

  override def beforeAll(): Unit = {
    val shuffleDir = Files.createTempDirectory("graft-dress-shuffle")
    spark = SparkSession.builder()
      .master(LambdaClusterManager.SCHEME + "graft-dress-fn")
      .config(graft.lambda.FaasDeploy.ControlPlaneDirKey, controlPlaneDir.toString)
      .appName("graft-daily-dress")
      .config("spark.executor.instances", "2")
      .config("spark.executor.cores", "1")
      .config("spark.executor.memory", "700m")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "localhost")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.GraftShuffleDataIO")
      .config(org.apache.spark.shuffle.graft.GraftShuffleManager.DirKey,
        "file:" + shuffleDir.toString)
      .config("spark.sql.shuffle.partitions", "4")
      // elastic-backend barrier mode: lineage kept, lost blocks
      // recompute (localCheckpoint would fail the job on the kill)
      .config(graft.api.Barrier.ConfKey, "persist")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def backend: LambdaSchedulerBackend =
    SchedulerBackdoor.backend(spark.sparkContext)
      .asInstanceOf[LambdaSchedulerBackend]

  private def eventually[A](timeoutSec: Int)(body: => A): A = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try return body
      catch { case e: Throwable => last = e; Thread.sleep(250) }
    }
    throw new AssertionError(s"condition not met within ${timeoutSec}s", last)
  }

  // p4's EXACT composition — the shared DailyPipeline definition the
  // oracle-gated bindings run, not a hand-copied twin that could drift
  // from their geometry. Returns the surviving doc ids after keep/drop.
  private def runDaily(root: String): Set[Long] = {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    DailyPipeline.seedAssets(spark, docs, root)
    DailyPipeline.runIncrement(spark, docs, root, compact = true)
    DailyPipeline.survivors(spark, docs, root)
      .collect().map(_.getLong(0)).toSet
  }

  test("daily pipeline on a self-deployed function + FS shuffle survives an invocation kill") {
    eventually(90)(assert(backend.liveInvocationIds.size == 2))

    // the session self-deployed this build on start, and the data plane
    // is the deployed-package client — executors run the published
    // artifact, with the driver's own code location off their classpath
    val cp = new graft.lambda.LocalDirControlPlane(controlPlaneDir)
    assert(cp.getFunction("graft-dress-fn").isDefined,
      "auto-deploy did not publish the function")
    val client = backend.faasClient
      .asInstanceOf[graft.lambda.DeployedPackageFaasClient]
    eventually(30)(assert(client.lastClasspath != null))
    val ownCode = graft.lambda.Deployer.defaultCodeLocation().getCanonicalPath
    assert(client.lastClasspath.split(java.io.File.pathSeparator).tail
        .forall(e => new java.io.File(e).getCanonicalPath != ownCode),
      "driver code location leaked into a deployed-function invocation")

    // The kill is PROGRESS-clocked, not wall-clocked: a listener counts
    // stage submissions and fires the kill when the second run reaches
    // ~1/3 of the clean run's stage count. (A wall-clock sleep derived
    // from the COLD first run let a JIT-warmed second run finish before
    // the kill landed — a vacuous pass that never exercised anything.)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var killAtStage = Int.MaxValue // disarmed during the clean run
    @volatile var killedAtStage = -1
    @volatile var killedId = ""
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        val n = stages.incrementAndGet()
        if (n >= killAtStage && killedAtStage < 0) {
          val live = backend.liveInvocationIds
          if (live.nonEmpty) {
            killedId = live.min
            backend.killInvocation(killedId)
            killedAtStage = n
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // clean run: the expected survivor set AND the stage-count clock
      val cleanRoot = Files.createTempDirectory("graft-dress-clean").toString
      val expected = runDaily(cleanRoot)
      assert(expected.nonEmpty && expected.size < 500,
        s"survivors ${expected.size} of 500 — the fixture must drop some docs")
      val cleanStages = stages.get()
      assert(cleanStages >= 6,
        s"pipeline ran only $cleanStages stages — too coarse to kill mid-run")

      // second run against fresh assets, one of the two leases killed
      // on the ~cleanStages/3-rd stage submission
      stages.set(0)
      killAtStage = math.max(cleanStages / 3, 2)
      val killRoot = Files.createTempDirectory("graft-dress-kill").toString
      val got = runDaily(killRoot)
      // the kill must have actually landed mid-pipeline — a pass where
      // it never fired (or fired after the last stage) proves nothing
      assert(killedAtStage >= 0, "the kill never fired — vacuous rehearsal")
      assert(stages.get() > killedAtStage,
        s"no stages after the kill (killed at $killedAtStage of ${stages.get()})")
      assert(got == expected,
        s"kill run diverged: missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")

      // the supervisor restores the lease count with a FRESH invocation
      // (executor ids never recycle, so the killed lease must be gone)
      eventually(90) {
        val live = backend.liveInvocationIds
        assert(live.size == 2 && !live.contains(killedId))
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
