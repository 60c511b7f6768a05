package graft.shuffle

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.lambda.LambdaClusterManager
import org.apache.spark.graft.SchedulerBackdoor
import org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reliability contract of the object-store shuffle on leased FaaS
  * executors — the property the reference buys by shuffling through S3
  * (`/root/reference/emitter.go:90-120`): an invocation can die AFTER
  * its map tasks ran and the reducers still read its output from the
  * shared FS. With executor-local shuffle, Spark must re-run the dead
  * executor's map tasks; with `GraftShuffleDataIO.supportsReliableStorage`
  * the DAGScheduler keeps the outputs registered and the map stage is
  * SKIPPED. Own forked JVM (owns a `lambda://local-sim` context). */
class GraftShuffleSimSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("graft-shuffle-sim")
    spark = SparkSession.builder()
      .master("lambda://" + LambdaClusterManager.LOCAL_SIM)
      .appName("graft-shuffle-sim")
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
        "file:" + dir.toString)
      .config("spark.sql.shuffle.partitions", "4")
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

  test("reducers read a dead invocation's map output from the FS; map stage skipped") {
    eventually(90)(assert(backend.liveInvocationIds.size == 2))
    val sc = spark.sparkContext
    val data = sc.parallelize(0 until 40000, 8).map(i => (i % 51, i.toLong))
    val shuffled = data.reduceByKey(_ + _)
    val expected = (0 until 40000).map(i => (i % 51, i.toLong))
      .groupMapReduce(_._1)(_._2)(_ + _)

    val counter = new StageCounter
    sc.addSparkListener(counter)
    try {
      // job 1: map tasks run on BOTH leased invocations (8 maps over
      // 2 single-core executors) and register their FS bin objects
      assert(shuffled.collect().toMap == expected)
      val afterFirst = eventually(10) {
        val n = counter.stages.size; assert(n >= 2); n
      }

      // kill one invocation — its JVM, local dirs, and block manager
      // are gone; its bin objects on the shared FS are not
      val victim = backend.liveInvocationIds.min
      assert(backend.killInvocation(victim))
      eventually(60) {
        assert(!backend.liveInvocationIds.contains(victim))
        // the scheduler has processed the loss (executor deregistered)
        val execs = sc.statusTracker.getExecutorInfos.map(_.host()).length
        assert(execs >= 1)
      }
      Thread.sleep(1500) // let DAGScheduler fully process executorLost

      // job 2 over the SAME dependency: with reliable shuffle storage
      // the map outputs survive the executor, so only the result stage
      // is submitted and no fetch fails — on executor-local shuffle
      // this re-runs the dead invocation's map tasks
      assert(shuffled.collect().toMap == expected)
      eventually(10)(assert(counter.stages.size == afterFirst + 1,
        s"map stage re-submitted after invocation kill: " +
          s"${counter.stages.asScala.toList}"))
      assert(counter.fetchFailed.isEmpty,
        s"fetch failures: ${counter.fetchFailed.asScala.toList}")
    } finally sc.removeSparkListener(counter)
  }
}
