package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Byte-level job metrics (reference F22: atomic bytesRead/bytesWritten
  * counters aggregated across tasks plus a wall-clock timer,
  * `/root/reference/job.go:29-30,47`, `/root/reference/driver.go:246-249`)
  * — here sourced from Spark's per-task Input/Output/Shuffle metrics via
  * a listener instead of hand-threaded counters.
  */
object Metrics {

  final case class Snapshot(bytesRead: Long, bytesWritten: Long,
      shuffleBytesWritten: Long, wallClockSec: Double,
      fsBytesRead: Long = 0L, executorRunTimeMs: Long = 0L,
      executorCpuTimeNs: Long = 0L) {
    /** Scheduler-delay factor of the tracked body's own tasks:
      * Σ executorRunTime / Σ executorCpuTime over every task that
      * completed during it — the same wall-vs-cpu kernel as Bench's
      * contention anchor, but with the SUITE'S OWN TASKS as the
      * kernel (r19 verdict task #1: a load window that opens between
      * the anchor's three legs inflates query rows the median-of-3
      * outvotes by design; per-query attribution needs a per-query
      * signal, and the tasks are already running — zero added load).
      * ~1 when every task thread held a core for its whole run;
      * inflates with co-tenant timeslicing and host steal, like the
      * anchor — plus the query's OWN non-CPU task time (shuffle-fetch
      * wait, spill IO, GC pauses), so the factor is comparable across
      * runs of the SAME query, not across queries: consumers compare
      * it against the suite's same-run median (Bench.delaySuspects),
      * never against an absolute 1.0. -1 (not measured) when the JVM
      * reported no CPU time. */
    def delayFactor: Double =
      if (executorCpuTimeNs <= 0) -1.0
      else executorRunTimeMs.toDouble / (executorCpuTimeNs / 1e6)
  }

  /** Sum of `bytesRead` across all Hadoop FileSystem statistics — the
    * filesystem-layer truth. Task-level `inputMetrics.bytesRead`
    * undercounts parquet scans whose data pages go through Hadoop
    * vectored IO (the vectored path bypasses stream statistics too, so
    * measurement harnesses that care should set
    * `parquet.hadoop.vectored.io.enabled=false`, as Bench does). */
  def globalFsBytesRead(): Long = {
    var total = 0L
    val it = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.iterator()
    while (it.hasNext) {
      val v = it.next().getLong("bytesRead")
      if (v != null) total += v.longValue()
    }
    total
  }

  /** Run `body`, returning its result plus the bytes moved by all Spark
    * tasks that completed during it. */
  def track[A](spark: SparkSession)(body: => A): (A, Snapshot) = {
    val read = new AtomicLong
    val written = new AtomicLong
    val shuffle = new AtomicLong
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          read.addAndGet(m.inputMetrics.bytesRead)
          written.addAndGet(m.outputMetrics.bytesWritten)
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fs0 = globalFsBytesRead()
    val t0 = System.nanoTime()
    try {
      val a = body
      val elapsed = (System.nanoTime() - t0) / 1e9 // before the settle wait
      // the listener bus is async (and its drain API is private): wait
      // until the counters settle (two equal consecutive reads), bounded
      // at ~1s. Zero is a valid settled value — a body that moves no
      // bytes settles in ~100ms rather than eating the full bound.
      var prev = -1L
      var spins = 0
      while (spins < 20) {
        // time counters included: a zero-byte query still has tasks
        // whose run/cpu sums must settle before the snapshot is read
        val cur = read.get + written.get + shuffle.get + runMs.get + cpuNs.get
        if (cur == prev) spins = 20
        else { prev = cur; spins += 1; Thread.sleep(50) }
      }
      (a, Snapshot(read.get(), written.get(), shuffle.get(), elapsed,
        globalFsBytesRead() - fs0, runMs.get(), cpuNs.get()))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
