package graft.lambda

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Straggler mitigation on the FaaS backend: corral's answer to a slow
  * Lambda invocation is the AWS-side retry of the whole invocation
  * (reference `internal/pkg/corlambda/client.go:236-276` retries failed
  * invokes); the Spark-native answer is SPECULATIVE EXECUTION — a task
  * whose runtime exceeds the multiplier × median of its stage is
  * re-launched on a DIFFERENT leased invocation, first result wins,
  * loser is killed. This spec proves the stock speculation machinery
  * composes with the lambda:// scheduler backend: the straggler's copy
  * lands on the other invocation and the stage finishes at fast-task
  * latency, not straggler latency.
  *
  * Runs in the lambda-sim forked JVM group (own SparkContext). */
class LambdaSimSpeculationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("lambda://" + LambdaClusterManager.LOCAL_SIM)
      .appName("graft-lambda-speculation")
      .config("spark.executor.instances", "2")
      .config("spark.executor.cores", "1")
      .config("spark.executor.memory", "700m")
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "localhost")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.quantile", "0.25")
      .config("spark.speculation.multiplier", "1.5")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a straggler is speculatively re-run on another invocation; job finishes at fast-task latency") {
    val sc = spark.sparkContext
    @volatile var sawSpeculative = false
    val listener = new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        if (t.taskInfo.speculative) sawSpeculative = true
    }
    sc.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      // partition 7's FIRST attempt stalls for 60 s; the speculative
      // copy (attemptNumber 1, necessarily on the other invocation —
      // speculation never re-lands on the executor running the
      // original) returns immediately
      val sum = sc.parallelize(1 to 80, 8).mapPartitionsWithIndex { (i, it) =>
        if (i == 7 && TaskContext.get.attemptNumber == 0)
          try Thread.sleep(60000)
          catch { case _: InterruptedException => () } // killed: copy won
        it.map(_.toLong)
      }.sum()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sum == (1 to 80).map(_.toLong).sum)
      assert(sawSpeculative,
        "no speculative task attempt was observed on the FaaS backend")
      assert(sec < 45,
        f"job took $sec%.1f s — speculation did not rescue the straggler")
    } finally sc.removeSparkListener(listener)
  }
}
