package graft.lambda

import org.apache.spark.graft.SchedulerBackdoor
import org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end FaaS-simulator run: `--master lambda://local-sim` leases
  * real executor JVM processes through the SPI-discovered cluster
  * manager (the e2e twin of the reference's mocked-lambda job test,
  * `/root/reference/lambda_test.go:20-141`). Runs in its own forked
  * test JVM (see build.sbt testGrouping) because it owns the
  * SparkContext. */
class LambdaSimSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("lambda://" + LambdaClusterManager.LOCAL_SIM)
      .appName("graft-lambda-sim")
      .config("spark.executor.instances", "2")
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

  private def eventually[A](timeoutSec: Int)(body: => A): A = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try return body
      catch { case e: Throwable => last = e; Thread.sleep(250) }
    }
    throw new AssertionError(s"condition not met within ${timeoutSec}s", last)
  }

  test("job runs on >= 2 simulated function invocations with correct results") {
    assert(backend.functionName == LambdaClusterManager.LOCAL_SIM)
    // two leases live (the supervisor converges to spark.executor.instances)
    eventually(90) {
      val live = backend.liveInvocationIds
      assert(live.size == 2, s"live invocations: $live")
    }
    // a shuffle job across the leased executors, checked exactly
    val df = spark.range(0, 10000, 1, 8)
      .groupBy((col("id") % 10).as("k")).agg(sum("id").as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0L until 10L).toSet)
    assert(rows(0L) == (0L until 10000L by 10).sum)
    assert(rows.values.sum == (0L until 10000L).sum)
    // the work really ran on the dialed-back executors, not the driver
    eventually(30) {
      val execs = spark.sparkContext.statusTracker.getExecutorInfos
      assert(execs.length >= 3, s"expected driver + 2 executors, got ${execs.length}")
    }
  }

  test("killing one invocation mid-stream: tasks reschedule, lease is replaced") {
    val before = eventually(90) {
      val live = backend.liveInvocationIds
      assert(live.size == 2); live
    }
    val victim = before.min
    assert(backend.killInvocation(victim))
    assert(!backend.killInvocation(victim)) // already gone

    // job submitted right after the kill still completes correctly —
    // Spark re-queues the dead executor's tasks (reference parity:
    // per-invocation retry, corlambda client.go:267-276; here Spark's
    // task-level retry does the work)
    val total = spark.range(0, 50000, 1, 16)
      .select(sum("id")).collect().head.getLong(0)
    assert(total == 49999L * 50000L / 2)

    // the supervisor re-invokes to restore the target count, with a
    // fresh executor id (a new function invocation, not a reconnect)
    eventually(90) {
      val live = backend.liveInvocationIds
      assert(live.size == 2 && !live.contains(victim), s"live: $live")
    }
    val replacement = backend.liveInvocationIds.diff(before)
    assert(replacement.nonEmpty)
  }

  test("requestTotalExecutors drives elastic lease capacity") {
    eventually(90)(assert(backend.activeInvocationIds.size == 2))
    // the dynamic-allocation entry point: raise the target to 3 leases
    assert(spark.sparkContext.requestTotalExecutors(3, 0, Map.empty))
    eventually(90) {
      val a = backend.activeInvocationIds
      assert(a.size == 3, s"active: $a")
    }
    // work spreads over the grown fleet with exact results
    val total = spark.range(0, 30000, 1, 12)
      .select(sum("id")).collect().head.getLong(0)
    assert(total == 29999L * 30000L / 2)
    // shrink back: scheduler kills a specific executor, supervisor
    // honors the lowered target instead of relaunching
    assert(spark.sparkContext.requestTotalExecutors(2, 0, Map.empty))
    val victim = backend.activeInvocationIds.max
    backend.killInvocation(victim)
    eventually(90) {
      val a = backend.activeInvocationIds
      assert(a.size == 2, s"active: $a")
    }
  }

  test("dd2 with persist barrier survives an invocation kill mid-query") {
    // The barrier-mode contract for elastic backends (Barrier.scala):
    // persist keeps lineage, so losing the executor that holds the
    // only copy of a barrier block recomputes instead of failing —
    // the property localCheckpoint (blocks-only, lineage severed)
    // cannot provide on decommissioning leases.
    eventually(90)(assert(backend.liveInvocationIds.size == 2))
    spark.conf.set("spark.graft.barrier", "persist")
    try {
      val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      def run(): Set[String] =
        graft.api.Dedup.jaccardPairs(docs, "doc_id", "text", 8, 4, 0.5)
          .collect().map(_.toString).toSet
      // clean pass: the expected pair set AND the clock for the kill
      val t0 = System.nanoTime()
      val expected = run()
      val cleanNanos = System.nanoTime() - t0
      assert(expected.nonEmpty)
      // second pass with one of the two leases killed mid-flight
      val killer = new Thread(() => {
        Thread.sleep(math.max(cleanNanos / 3000000L, 200L)) // ~1/3 in, ms
        val live = backend.liveInvocationIds
        if (live.nonEmpty) backend.killInvocation(live.min)
      })
      killer.start()
      val got = run()
      killer.join()
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
      // the supervisor restores the lease count afterwards
      eventually(90)(assert(backend.liveInvocationIds.size == 2))
    } finally spark.conf.unset("spark.graft.barrier")
  }

  test("lease expiry decommissions gracefully and rolls invocations over") {
    // re-create the context with a short lease (the lease is read at
    // backend construction) + decommission enabled
    spark.stop()
    spark = SparkSession.builder()
      .master("lambda://" + LambdaClusterManager.LOCAL_SIM)
      .appName("graft-lambda-sim-lease")
      .config("spark.executor.instances", "2")
      .config("spark.executor.cores", "1")
      .config("spark.executor.memory", "700m")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "localhost")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.decommission.enabled", "true")
      .config("spark.graft.lambda.leaseSeconds", "18")
      .config("spark.graft.lambda.leaseGraceSeconds", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gen0 = eventually(90) {
      val a = backend.activeInvocationIds
      assert(a.size == 2, s"active: $a"); a
    }
    // run jobs continuously UNTIL a full lease rollover completes —
    // every result must stay exact while leases decommission + replace
    var runs = 0
    eventually(90) {
      val total = spark.range(0, 20000, 1, 8)
        .select(org.apache.spark.sql.functions.sum("id"))
        .collect().head.getLong(0)
      assert(total == 19999L * 20000L / 2)
      runs += 1
      val a = backend.activeInvocationIds
      assert(a.intersect(gen0).isEmpty, s"gen0 still active: ${a.intersect(gen0)}")
    }
    assert(runs >= 1)
    // replacements (fresh invocations, new ids) carry the target count
    eventually(60) {
      val a = backend.activeInvocationIds
      assert(a.size == 2 && a.intersect(gen0).isEmpty,
        s"active: $a, gen0: $gen0")
    }
  }
}
