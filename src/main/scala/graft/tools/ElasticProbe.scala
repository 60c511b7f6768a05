package graft.tools

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Burst→cap→floor lease trajectory ON THE DEPLOYED CONFIG — the
  * positive control for the r18 elastic bench finding. The elastic
  * sf0.1 bench leg converged to the FLOOR and stayed there
  * (composite parity proved that was CORRECT: each stage's backlog
  * at fixture scale is shorter than an invocation spin-up, so the
  * allocation manager never sustains a scale-up — the scale-to-zero
  * cost model working). LambdaSimElasticSpec proves burst→cap on the
  * LOCAL_SIM function; what neither measured is the trajectory on
  * the NORTH-STAR deployment shape — a named self-deployed function
  * + `graftfs://` object-store shuffle — under a stage long enough
  * to sustain backlog, i.e. the 100 TB-shaped regime where stages
  * run minutes, not hundreds of milliseconds.
  *
  * Phases, lease count sampled every 2 s from the backend's own
  * bookkeeping ([[org.apache.spark.graft.LeaseCount]] — the status
  * store's active list is wrong under dynamic allocation):
  *   1. idle-settle: no work — expect decay to `minExecutors`;
  *   2. burst: `SPARK_GRAFT_ELASTIC_TASKS` (default 64) tasks of
  *      `SPARK_GRAFT_ELASTIC_TASK_SEC` (default 8) seconds each — a
  *      sustained backlog minutes long on cap cores; expect rise to
  *      `maxExecutors` and NEVER beyond;
  *   3. drain: idle — expect decay back to the floor.
  *
  * Env: the standard north-star plumbing (SPARK_GRAFT_MASTER,
  * SPARK_GRAFT_FAAS_CONTROL_PLANE, SPARK_GRAFT_SHUFFLE_DIR,
  * SPARK_GRAFT_EXECUTOR_CORES/_MEM) + the dynamicAllocation confs
  * via SPARK_GRAFT_JVM_CONFS. Prints one JSON line with the phase
  * boundaries, the full trajectory, and min/max per phase. */
object ElasticProbe {

  def main(args: Array[String]): Unit = {
    val tasks = sys.env.getOrElse("SPARK_GRAFT_ELASTIC_TASKS", "64").toInt
    val taskSec = sys.env.getOrElse("SPARK_GRAFT_ELASTIC_TASK_SEC", "8").toInt
    val settleSec = sys.env.getOrElse("SPARK_GRAFT_ELASTIC_SETTLE_SEC", "90").toInt
    val spark = graft.Bench.withShuffleEnv(
      graft.Bench.withMasterEnv(SparkSession.builder(), "local[4]")
        .appName("graft-elastic-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val samples = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    val marks = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val t0 = System.nanoTime()
    def now: Long = (System.nanoTime() - t0) / 1000000000L
    val stop = new AtomicBoolean(false)
    val sampler = new Thread(() => while (!stop.get()) {
      try {
        val n = org.apache.spark.graft.LeaseCount.active(sc).getOrElse(-1)
        samples.synchronized { samples += ((now, n)) }
      } catch { case _: Throwable => }
      Thread.sleep(2000)
    })
    sampler.setDaemon(true)
    sampler.start()

    def phase[A](name: String)(body: => A): A = {
      marks += ((name, now)); body
    }

    // 1. settle to the floor (allocation manager targets min with no
    // pending tasks; the supervisor reaps surplus leases)
    phase("settle")(Thread.sleep(settleSec * 1000L))
    // 2. sustained burst: tasks x taskSec seconds of backlog — minutes
    // of pending work on cap cores, the 100 TB stage shape
    val expected = (1L to tasks.toLong).sum
    val got = phase("burst") {
      sc.parallelize(1 to tasks, tasks).map { i =>
        Thread.sleep(taskSec * 1000L); i.toLong
      }.sum()
    }
    require(got == expected, s"burst result $got != $expected")
    // 3. drain back to the floor
    phase("drain")(Thread.sleep(settleSec * 1000L))
    marks += (("end", now))
    stop.set(true)

    val snap = samples.synchronized(samples.toVector)
    def window(a: Long, b: Long) = snap.filter(s => s._1 >= a && s._1 < b)
    val summary = marks.toVector.sliding(2).collect {
      case Vector((name, a), (_, b)) =>
        val w = window(a, b).map(_._2)
        val (lo, hi) = if (w.isEmpty) (-1, -1) else (w.min, w.max)
        f""""$name":{"from":$a,"to":$b,"min":$lo,"max":$hi}"""
    }.mkString(",")
    val traj = snap.map { case (t, n) => s"[$t,$n]" }.mkString("[", ",", "]")
    println(s"""{"probe":"elastic","master":${graft.Bench.jstr(
      graft.Bench.masterMode)},"shuffle":${graft.Bench.jstr(
      graft.Bench.shuffleMode)},"tasks":$tasks,"task_sec":$taskSec,""" +
      s"""$summary,"trajectory":$traj}""")
    spark.stop()
  }
}
