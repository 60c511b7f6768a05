package graft.lambda

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import org.apache.spark.graft.SchedulerBackdoor
import org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Executor-lease ELASTICITY on the FaaS backend: corral sizes its
  * invocation fan-out to the live backlog under a `maxConcurrency` cap
  * (`/root/reference/internal/pkg/corral/driver.go:143-150`); the
  * Spark-first mapping is Spark's own ExecutorAllocationManager
  * driving the backend's existing capacity hooks — backlog raises the
  * requested total (`doRequestTotalExecutors`, supervisor tops up with
  * fresh invocations), idleness kills executors (`doKillExecutors`
  * releases their invocations), and `maxExecutors` is the concurrency
  * cap. This spec proves the lease-count trajectory end to end on real
  * leased processes: burst → rises to the cap, drain → decays to the
  * floor. Scale-to-zero-ish cost behavior falls out of the same wiring
  * (minExecutors=0 would go all the way down).
  *
  * Runs in the lambda-sim forked JVM group (build.sbt testGrouping);
  * owns its SparkContext because dynamic-allocation confs are static. */
class LambdaSimElasticSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("lambda://" + LambdaClusterManager.LOCAL_SIM)
      .appName("graft-lambda-elastic")
      .config("spark.executor.cores", "1")
      .config("spark.executor.memory", "700m")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "localhost")
      .config("spark.dynamicAllocation.enabled", "true")
      .config("spark.dynamicAllocation.minExecutors", "1")
      .config("spark.dynamicAllocation.initialExecutors", "1")
      // the maxConcurrency cap (corral driver.go:143-150)
      .config("spark.dynamicAllocation.maxExecutors", "3")
      .config("spark.dynamicAllocation.schedulerBacklogTimeout", "1s")
      .config("spark.dynamicAllocation.sustainedSchedulerBacklogTimeout", "1s")
      .config("spark.dynamicAllocation.executorIdleTimeout", "3s")
      // no external shuffle service in a FaaS sandbox: shuffle
      // tracking is what makes DA legal (the burst job below is
      // deliberately shuffle-free so idle decay isn't pinned by
      // tracked shuffle data)
      .config("spark.dynamicAllocation.shuffleTracking.enabled", "true")
      .config("spark.dynamicAllocation.shuffleTracking.timeout", "5s")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def backend: LambdaSchedulerBackend =
    SchedulerBackdoor.backend(spark.sparkContext).asInstanceOf[LambdaSchedulerBackend]

  private def eventually[A](timeoutSec: Int)(body: => A): A = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try return body
      catch { case e: Throwable => last = e; Thread.sleep(250) }
    }
    throw new AssertionError(s"condition not met within ${timeoutSec}s", last)
  }

  test("burst raises the lease count to the cap; drain decays it to the floor") {
    // converges to the floor first (initial = min = 1)
    eventually(90) {
      assert(backend.activeInvocationIds.size == 1,
        s"active: ${backend.activeInvocationIds}")
    }

    // burst: 12 serial-3s tasks against 1-core executors — a sustained
    // backlog the allocation manager must answer by requesting more
    // executors, which the supervisor serves with fresh invocations
    import scala.concurrent.ExecutionContext.Implicits.global
    val sc = spark.sparkContext
    val burst = Future {
      sc.parallelize(1 to 12, 12).map { i => Thread.sleep(3000); i.toLong }.sum()
    }

    // while the burst runs: lease count rises to maxExecutors and
    // NEVER beyond it (the cap is corral's maxConcurrency analogue)
    eventually(90) {
      val n = backend.activeInvocationIds.size
      assert(n == 3, s"active leases under burst: $n")
    }
    assert(Await.result(burst, 180.seconds) == (1 to 12).map(_.toLong).sum)
    assert(backend.activeInvocationIds.size <= 3)

    // drain: idle executors are released (their invocations killed)
    // back down to minExecutors — capacity follows the workload, the
    // FaaS cost model corral's per-task invokes get for free and a
    // leased backend must earn
    eventually(90) {
      assert(backend.activeInvocationIds.size == 1,
        s"active after drain: ${backend.activeInvocationIds}")
    }

    // ... and the floor still serves work correctly after the decay
    val total = sc.parallelize(1 to 1000, 4).map(_.toLong).sum()
    assert(total == 500500L)
  }
}
