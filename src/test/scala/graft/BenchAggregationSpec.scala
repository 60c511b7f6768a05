package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function contract of Bench's pass aggregation: per-query min,
  * bytes attributed to the pass that produced the min, max/min spread,
  * failure handling, and heavy-query selection. (The measurement loop
  * itself is the `graft.Bench` main — these pin the arithmetic the
  * round artifact's headline numbers come from.) */
class BenchAggregationSpec extends AnyFunSuite {

  private def m(t: Double, r: Long = 0L, s: Long = 0L, f: Long = 0L,
      d: Double = 1.0) =
    (t, r, s, f, d)

  test("min over passes; bytes come from the pass that produced the min") {
    val passes = Seq(
      Map("q" -> m(2.0, r = 111L, s = 11L, f = 1L)),
      Map("q" -> m(1.5, r = 222L, s = 22L, f = 2L)),
      Map("q" -> m(1.8, r = 333L, s = 33L, f = 3L)))
    val Seq((name, best, r, s, f, spread, _)) = Bench.aggregate(Seq("q"), passes)
    assert(name == "q" && best == 1.5)
    assert((r, s, f) == ((222L, 22L, 2L)),
      "bytes must be attributed to the min-time pass, not the first")
    assert(math.abs(spread - 2.0 / 1.5) < 1e-12)
  }

  test("a pass-1 failure recovers via pass 2 and reports pass-2 bytes, not zeros") {
    val passes = Seq(
      Map("q" -> m(-1.0)), // failed: zero bytes recorded
      Map("q" -> m(2.5, r = 42L, s = 7L, f = 9L)))
    val Seq((_, best, r, s, f, spread, _)) = Bench.aggregate(Seq("q"), passes)
    assert(best == 2.5)
    assert((r, s, f) == ((42L, 7L, 9L)),
      "the old first-pass rule reported 0 bytes for a query with a valid timing")
    assert(spread == 1.0, "a single successful pass has no spread")
  }

  test("a query that failed every pass stays -1.0") {
    val passes = Seq(Map("q" -> m(-1.0)), Map("q" -> m(-1.0)))
    val Seq((_, best, _, _, _, _, _)) = Bench.aggregate(Seq("q"), passes)
    assert(best == -1.0)
  }

  test("queries absent from extra passes aggregate over their own passes only") {
    // the heavy-query extra pass runs a SUBSET; light queries must not
    // be affected by their absence from it
    val passes = Seq(
      Map("light" -> m(1.0), "heavy" -> m(5.0)),
      Map("light" -> m(1.1), "heavy" -> m(4.0)),
      Map("heavy" -> m(6.0))) // extra pass: heavy only
    val res = Bench.aggregate(Seq("light", "heavy"), passes).map(t => t._1 -> t).toMap
    assert(res("light")._2 == 1.0)
    assert(math.abs(res("light")._6 - 1.1) < 1e-12)
    assert(res("heavy")._2 == 4.0)
    assert(math.abs(res("heavy")._6 - 6.0 / 4.0) < 1e-12)
  }

  test("a 0.0 min yields spread 1.0, never Infinity/NaN in the artifact") {
    // max/min over a sub-resolution 0.0 measurement would print a bare
    // Infinity (or NaN for 0/0) token — unparseable JSON
    val Seq((_, _, _, _, _, zeroMin, _)) =
      Bench.aggregate(Seq("q"), Seq(Map("q" -> m(0.0)), Map("q" -> m(0.4))))
    assert(zeroMin == 1.0)
    val Seq((_, _, _, _, _, allZero, _)) =
      Bench.aggregate(Seq("q"), Seq(Map("q" -> m(0.0)), Map("q" -> m(0.0))))
    assert(allZero == 1.0)
  }

  test("refinement targets: spread-noisy queries only; failed and tight rows excluded") {
    val passes = Seq(
      Map("tight" -> m(1.00), "noisy" -> m(2.0), "dead" -> m(-1.0)),
      Map("tight" -> m(1.10), "noisy" -> m(1.2), "dead" -> m(-1.0)))
    // tight: spread 1.10 <= 1.25 — converged; noisy: 1.67 — refine;
    // dead: every pass failed — nothing to refine
    assert(Bench.refineTargets(Seq("tight", "noisy", "dead"), passes) ==
      Seq("noisy"))
    // a refinement pass that lands INSIDE the spread target drops the
    // query from the next round's target computation only via the
    // ImproveEps rule in main — the target function itself stays a
    // pure function of the recorded passes
    assert(Bench.SpreadTarget == 1.25 && Bench.ImproveEps == 0.02)
  }

  test("heavy selection: warm min >= HeavySec, failures ignored") {
    val passes = Seq(
      Map("a" -> m(2.9), "b" -> m(3.5), "c" -> m(-1.0), "d" -> m(10.0)),
      Map("a" -> m(3.2), "b" -> m(3.1), "c" -> m(-1.0), "d" -> m(2.0)))
    // a: min 2.9 < 3 — light; b: min 3.1 — heavy; c: all failed — not
    // heavy; d: min 2.0 — light (one fast pass disqualifies)
    assert(Bench.heavyQueries(Seq("a", "b", "c", "d"), passes) == Seq("b"))
  }

  test("box_factor: median of the legs' delay factors") {
    // sustained contention inflates >= 2 of 3 legs — the median sees
    // it; a transient burst at ONE endpoint is outvoted (the r19
    // wall-clock prototype false-flagged a quiet suite off a single
    // inflated start sample)
    assert(Bench.boxFactorOf(true, Seq(1.02, 2.0, 1.9)) == 1.9)
    assert(Bench.boxFactorOf(true, Seq(2.0, 1.02, 1.05)) == 1.05)
    // quiet box at ambient load: ~1.05-1.09, under the drift threshold
    assert(Bench.boxFactorOf(true,
      Seq(1.05, 1.09, 1.03)) <= Bench.CalibDriftMax)
    // the r18 postmortem's shape: a co-tenant build timeslices every
    // leg — MUST flag; the relative warm-vs-cold sentinels cannot see
    // uniform inflation
    assert(Bench.boxFactorOf(true,
      Seq(1.5, 1.6, 1.45)) > Bench.CalibDriftMax)
    // a leg whose CPU time was unreadable (-1) is dropped, not median'd
    // — and the remaining EVEN-sized list takes the LOWER median: with
    // two legs the upper median is the max, so one transient burst in
    // either leg would flag the run alone (r19 ADVICE)
    assert(Bench.boxFactorOf(true, Seq(-1.0, 1.5, 1.6)) == 1.5)
    assert(Bench.boxFactorOf(true, Seq(-1.0, 1.05, 2.4)) == 1.05)
    assert(Bench.boxLoadOf(true, 0.5, Seq(0.55, 2.0)) == 1.1)
  }

  test("box_factor/box_load: -1 (not measured) when skipped or empty") {
    assert(Bench.boxFactorOf(false, Seq(1.5)) == -1.0)
    assert(Bench.boxFactorOf(true, Seq.empty) == -1.0)
    assert(Bench.boxFactorOf(true, Seq(-1.0, -1.0)) == -1.0)
    assert(Bench.boxLoadOf(false, 0.53, Seq(0.6)) == -1.0)
    assert(Bench.boxLoadOf(true, 0.0, Seq(0.6)) == -1.0)
    assert(Bench.boxLoadOf(true, 0.53, Seq.empty) == -1.0)
  }

  test("box_load: median wall over the committed reference") {
    assert(Bench.boxLoadOf(true, 0.5, Seq(0.5, 1.0, 1.0)) == 2.0)
    assert(Bench.boxLoadOf(true, 0.5, Seq(1.0, 0.5, 0.52)) == 1.04)
  }

  test("contended_reason attributes the firing sentinels, +-joined") {
    assert(Bench.contendedReasonOf(relative = false, anchor = false) == "none")
    assert(Bench.contendedReasonOf(relative = true, anchor = false) == "relative")
    assert(Bench.contendedReasonOf(relative = false, anchor = true) == "anchor")
    assert(Bench.contendedReasonOf(relative = true, anchor = true) ==
      "relative+anchor")
    // the r19-verdict scenario: load window between the anchor legs —
    // the 3-leg median reads quiet, the relative sentinels read quiet,
    // ONLY the suite's own tasks see it
    assert(Bench.contendedReasonOf(relative = false, anchor = false,
      perQuery = true) == "per-query")
    assert(Bench.contendedReasonOf(relative = false, anchor = true,
      perQuery = true) == "anchor+per-query")
    assert(Bench.contendedReasonOf(relative = true, anchor = true,
      perQuery = true) == "relative+anchor+per-query")
  }

  test("delay factor is attributed to the pass that produced the min") {
    // the composite uses the min time — its contention read must come
    // from the SAME pass: a min that escaped the load window reads
    // quiet even when another pass of the query was inflated
    val passes = Seq(
      Map("q" -> m(2.0, d = 4.2)), // loaded pass: slow AND delayed
      Map("q" -> m(1.5, d = 1.2)))
    val Seq((_, best, _, _, _, _, d)) = Bench.aggregate(Seq("q"), passes)
    assert(best == 1.5 && d == 1.2)
  }

  test("delay median: unmeasured rows dropped, lower median, -1 when empty") {
    assert(Bench.delayMedian(Seq(1.0, 1.2, 1.4)) == 1.2)
    assert(Bench.delayMedian(Seq(-1.0, 1.0, 3.0)) == 1.0)
    assert(Bench.delayMedian(Seq.empty) == -1.0)
    assert(Bench.delayMedian(Seq(-1.0, -1.0)) == -1.0)
  }

  test("delay suspects: outliers vs own cold factor floored at the cold median") {
    // rows are (name, min-pass factor, cold factor) — both baselines
    // come from the COLD pass: a warm-median baseline would
    // self-normalize the r19 case (most of the suite inflated
    // together after a quiet cold pass)
    // quiet suite: every factor near the median, cold matches warm
    val quiet = Seq(("a", 1.1, 1.2), ("b", 1.3, 1.3), ("c", 1.2, 1.1),
      ("d", 1.6, 1.5))
    assert(Bench.delaySuspects(quiet).isEmpty)
    // the r20 calibration case: an IO-shaped row (parquet write +
    // read-back) reads 3.4x the suite median on a QUIET box — but its
    // cold factor carries the same shape, so it must NOT be flagged
    val ioShaped = Seq(("a", 1.2, 1.3), ("b", 1.4, 1.3), ("c", 1.3, 1.2),
      ("ex6", 4.9, 4.8))
    assert(Bench.delaySuspects(ioShaped).isEmpty)
    // a load window strictly inside the warm passes: affected rows'
    // warm factors inflate ~2x while their cold factors stay quiet
    val windowed = Seq(("a", 1.1, 1.2), ("b", 1.2, 1.1), ("c", 3.9, 1.3),
      ("d", 4.4, 1.2), ("e", 1.3, 1.4), ("f", 2.9, 1.2))
    assert(Bench.delaySuspects(windowed) == Seq("c", "d", "f"))
    // an unmeasured cold factor (cold pass failed) falls back to the
    // suite-median clause alone
    val noCold = Seq(("a", 1.1, 1.2), ("b", 1.2, 1.1), ("c", 3.9, -1.0),
      ("d", 1.3, 1.2))
    assert(Bench.delaySuspects(noCold) == Seq("c"))
    // nothing measured -> nothing flagged (never a spurious flag on a
    // JVM without per-thread CPU accounting)
    assert(Bench.delaySuspects(Seq(("a", -1.0, -1.0))).isEmpty)
  }

  test("calibration kernel runs, is not DCE'd, and reads CPU time") {
    // one anchor leg takes ~0.5 s/rep on this box; anything under
    // 50 ms means the JIT deleted the loop (the sink failed to keep
    // it live)
    val (wall, delay) = Bench.calibLeg()
    assert(wall > 0.05, s"kernel wall-clock $wall s — loop eliminated?")
    assert(wall < 60.0, s"kernel wall-clock $wall s — runaway")
    // delay factor: >= ~1 by construction (threads can't get more
    // than a core each); an in-test upper bound would encode box
    // state, so only sanity-check the support path
    assert(delay == -1.0 || delay > 0.9,
      s"delay factor $delay — per-thread CPU accounting broken?")
  }
}
