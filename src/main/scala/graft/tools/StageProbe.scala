package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage time attribution for registered queries (r20 optimization
  * round, guide §1: decide whether the time goes to shuffle read,
  * executor compute, or a SERIAL stage before optimizing anything).
  *
  * For each named query (default: the bench set) the probe runs one
  * warm-up pass, then one measured pass under a stage listener, and
  * prints per stage: task count, Σ executorRunTime, max task time, Σ
  * shuffle-read fetch wait, and the stage's first callSite line. The
  * headline diagnostic is `par` = Σ runTime / wall — an effective
  * parallelism of ~1.0 on a 32-core box means the query is bound by a
  * single-task stage (the sf fixtures are one-row-group parquet files,
  * so every scan stage is ONE task regardless of split config — work
  * riding directly on a scan runs serial until the first exchange).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StageProbe q32_substring_overlap ..."
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false")
    // extra session confs for hypothesis tests, e.g.
    // SPARK_GRAFT_PROBE_CONFS="spark.buffer.pageSize=1m"
    sys.env.get("SPARK_GRAFT_PROBE_CONFS").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_STAGEPROBE_AB=1: measure each query twice per rep —
    // widen off then on (same JVM, adjacent in time) — so box drift
    // cannot masquerade as a widen() effect. REPS repeats the whole
    // A/B pair list; the per-variant min is the comparable number.
    val ab = sys.env.getOrElse("SPARK_GRAFT_STAGEPROBE_AB", "0") == "1"
    val reps = sys.env.getOrElse("SPARK_GRAFT_STAGEPROBE_REPS", "1").toInt
    val names0 = if (args.nonEmpty) args.toSeq else graft.SparkEntry.benchQueries
    val names = (1 to reps).flatMap(_ => names0).flatMap { n =>
      if (ab) Seq(s"$n@off", s"$n@on") else Seq(n)
    }
    names.foreach { tagged =>
      val (name, variant) = tagged.split("@") match {
        case Array(n, v) => (n, v)
        case _ => (tagged, "")
      }
      if (variant.nonEmpty)
        spark.conf.set(graft.api.Scan.WidenConfKey, variant)
      val fn = graft.SparkEntry.queries(name)
      // warm-up: planning + codegen + JIT out of the measured pass
      graft.api.Barrier.scoped(graft.Bench.materialize(fn(spark, sfDir)))

      final case class Agg(var tasks: Int = 0, var runMs: Long = 0L,
        var maxMs: Long = 0L, var fetchWaitMs: Long = 0L,
        var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L,
        var inputB: Long = 0L)
      val byStage = new ConcurrentHashMap[Int, Agg]()
      val stageNames = new ConcurrentHashMap[Int, String]()
      // r21: job count — the orchestration-bound family's cost is
      // driver round-trips, so the probe reports how many jobs the
      // measured pass launched beside the per-stage attribution
      val jobCount = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            val a = byStage.computeIfAbsent(t.stageId, _ => Agg())
            a.synchronized {
              a.tasks += 1
              a.runMs += m.executorRunTime
              a.maxMs = math.max(a.maxMs, m.executorRunTime)
              a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
              a.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
              a.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
              a.inputB += m.inputMetrics.bytesRead
            }
          }
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val info = s.stageInfo
          val site = Option(info.details).map(_.linesIterator.take(1).mkString)
            .getOrElse("")
          stageNames.put(info.stageId, s"${info.name.take(60)} | $site".take(110))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try graft.api.Barrier.scoped(graft.Bench.materialize(fn(spark, sfDir)))
      finally {
        // let the async listener bus drain before reading the maps
        Thread.sleep(600)
        spark.sparkContext.removeSparkListener(listener)
      }
      val wallMs = (System.nanoTime() - t0) / 1e6
      import scala.jdk.CollectionConverters._
      val rows = byStage.asScala.toSeq.sortBy(-_._2.runMs)
      val totRun = rows.map(_._2.runMs).sum
      println(f"%n== $tagged: wall=${wallMs / 1000}%.3f s  sumRun=${totRun / 1000.0}%.3f s  par=${totRun / wallMs}%.2f  stages=${rows.size}  jobs=${jobCount.get()}")
      rows.take(10).foreach { case (sid, a) =>
        val nm = Option(stageNames.get(sid)).getOrElse("?")
        println(f"  stage $sid%4d tasks=${a.tasks}%4d sumRun=${a.runMs / 1000.0}%8.3f s maxTask=${a.maxMs / 1000.0}%7.3f s fetchWait=${a.fetchWaitMs}%6d ms in=${a.inputB / 1024}%8d KiB sR=${a.shuffleReadB / 1024}%7d KiB sW=${a.shuffleWriteB / 1024}%7d KiB  $nm")
      }
    }
    spark.stop()
  }
}
