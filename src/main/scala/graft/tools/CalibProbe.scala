package graft.tools

/** Measurement main for [[graft.Bench]]'s absolute contention anchor
  * (r18 verdict task #1): prints N independent anchor legs — each an
  * all-cores run of the calibration kernel reporting (wall-clock sec,
  * scheduler-delay factor = wall · threads / Σ per-thread CPU time) —
  * so the committed quiet-box wall reference (`Bench.CalibRefSec`)
  * is a measured min, the quiet-box delay band is on record, and the
  * contended-demo leg (kernel under a deliberate background load) has
  * numbers to stand on without running a full bench suite.
  *
  * Also prints single-thread wall samples: the r19 session measured
  * them jittering 29% on a quiet box (frequency ramp + migration),
  * which is why the single-thread wall-clock prototype of the anchor
  * was rejected for the delay factor.
  *
  * `SPARK_GRAFT_CALIB_SAMPLES` (default 5) — independent legs to
  * print per mode.
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CALIB_SAMPLES", "5").toInt
    val p = Runtime.getRuntime.availableProcessors()
    val legs = (1 to n).map { i =>
      val (w, d) = graft.Bench.calibLeg()
      println(f"[calib] all-cores ($p) leg $i: wall $w%.3f s, delay factor $d%.3f")
      (w, d)
    }
    val single = (1 to n).map { i =>
      val s = graft.Bench.calibSec()
      println(f"[calib] single-thread sample $i: $s%.3f s")
      s
    }
    println(f"[calib] min over $n legs: wall ${legs.map(_._1).min}%.3f s, " +
      f"delay ${legs.map(_._2).min}%.3f; single-thread min ${single.min}%.3f s")
  }
}
