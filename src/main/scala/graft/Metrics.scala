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
      shuffleBytesWritten: Long, wallClockSec: Double)

  /** Run `body`, returning its result plus the bytes moved by all Spark
    * tasks that completed during it. */
  def track[A](spark: SparkSession)(body: => A): (A, Snapshot) = {
    val read = new AtomicLong
    val written = new AtomicLong
    val shuffle = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          read.addAndGet(m.inputMetrics.bytesRead)
          written.addAndGet(m.outputMetrics.bytesWritten)
          shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      val a = body
      val elapsed = (System.nanoTime() - t0) / 1e9 // before the settle wait
      // the listener bus is async (and its drain API is private): wait
      // until the counters settle, bounded at ~1s
      var prev = -1L
      var spins = 0
      while (spins < 20) {
        val cur = read.get + written.get + shuffle.get
        if (cur == prev && cur > 0) spins = 20
        else { prev = cur; spins += 1; Thread.sleep(50) }
      }
      (a, Snapshot(read.get(), written.get(), shuffle.get(), elapsed))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
