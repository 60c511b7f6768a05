package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ScaleProbe.artifactLine]]'s artifact-always-parses contract
  * (multi-scale form since round 12): a failed row's NaN exponent
  * serializes as JSON null (never a bare NaN/Infinity token), noise
  * rows land in `noise_suspect`, and the line survives a naive JSON
  * parse. Mirrors BenchAggregationSpec's role for Bench's artifact.
  * Also pins the replica-cipher properties the fixture's linearity
  * claim rests on. */
class ScaleProbeArtifactSpec extends AnyFunSuite {

  import ScaleProbe.{ProbeRow, ScalePoint}

  private val ok = ProbeRow("dd7_incremental",
    Seq(ScalePoint("sf0.1", 1, 1.45, 1.09), ScalePoint("sf1", 10, 1.47, 1.03),
      ScalePoint("sf10", 100, 1.52, 1.05)),
    Seq("sf0.1->sf1" -> 0.01, "sf1->sf10" -> 0.01), noise = false)
  private val failed = ProbeRow("p4p_daily_increment_asset",
    Seq(ScalePoint("sf0.1", 1, 2.5, 1.02), ScalePoint("sf1", 10, -1.0, 1.0)),
    Seq("sf0.1->sf1" -> Double.NaN), noise = true)

  // a JSON-enough parse: balanced braces, no bare NaN/Infinity tokens
  private def assertParses(line: String): Unit = {
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(!line.contains("NaN") && !line.contains("Infinity"), line)
  }

  test("a failed row's exponent serializes as null, row flagged as noise") {
    val line = ScaleProbe.artifactLine(Seq(10, 100), Seq(ok, failed))
    assertParses(line)
    assert(line.contains(""""sf0.1->sf1":null"""))
    assert(line.contains(""""sf1":{"warm":-1.0"""))
    assert(line.contains(""""noise_suspect":["p4p_daily_increment_asset"]"""))
    assert(line.contains(""""reps":[10,100]"""))
    // the healthy row carries both decades
    assert(line.contains(""""dd7_incremental":{"scales":{"sf0.1":{"warm":1.45"""))
    assert(line.contains(""""sf1->sf10":0.01"""))
  }

  test("all-healthy rows produce an empty noise_suspect and finite numbers") {
    val line = ScaleProbe.artifactLine(Seq(10), Seq(ok))
    assertParses(line)
    assert(line.contains(""""noise_suspect":[]"""))
    assert(!line.contains("null"))
  }

  test("an Infinity spread (guarded upstream, belt-and-braces here) nulls out") {
    val inf = ProbeRow("q32_substring_overlap",
      Seq(ScalePoint("sf0.1", 1, 0.0, Double.PositiveInfinity),
        ScalePoint("sf1", 10, 1.0, 1.0)),
      Seq("sf0.1->sf1" -> Double.NegativeInfinity), noise = true)
    assertParses(ScaleProbe.artifactLine(Seq(10), Seq(inf)))
  }

  test("replica alphabets are bijections, replica 0 is the identity, no verbatim replicas") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    assert(ScaleProbe.replicaAlphabet(0) == lower)
    // 100 replicas (the sf10 fixture): every alphabet is a permutation
    // of the 26 letters, none is the identity, and all are pairwise
    // distinct — so no replica pair is a verbatim copy (the quadratic
    // pair blowup the cipher exists to avoid)
    val alphas = (1 to 100).map(ScaleProbe.replicaAlphabet)
    alphas.foreach(a => assert(a.sorted == lower, a))
    alphas.foreach(a => assert(a != lower))
    assert(alphas.distinct.size == alphas.size, "two replicas share a cipher")
  }

  test("replica signs: identity at 0, ±1 only, pairwise distinct, dot-preserving") {
    val dim = 64
    assert(ScaleProbe.replicaSigns(0, dim).forall(_ == 1.0f))
    val signs = (1 to 100).map(r => ScaleProbe.replicaSigns(r, dim).toSeq)
    signs.foreach(s => assert(s.forall(v => v == 1.0f || v == -1.0f)))
    assert(signs.distinct.size == signs.size, "two replicas share a sign cipher")
    // within-replica dot preservation is exact: signs cancel pairwise
    val x = Array.tabulate(dim)(i => (i * 0.37f - 3.1f))
    val y = Array.tabulate(dim)(i => (1.9f - i * 0.11f))
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val s7 = ScaleProbe.replicaSigns(7, dim)
    val xs = x.toSeq.zip(s7).map { case (v, s) => v * s }
    val ys = y.toSeq.zip(s7).map { case (v, s) => v * s }
    assert(dot(xs, ys) == dot(x.toSeq, y.toSeq))
  }

  test("scaleLabel names scales relative to the sf0.1 source") {
    assert(ScaleProbe.scaleLabel(10) == "sf1")
    assert(ScaleProbe.scaleLabel(100) == "sf10")
    assert(ScaleProbe.scaleLabel(5) == "sf0.5")
  }
}
