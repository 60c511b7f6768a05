package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ScaleProbe.artifactLine]]'s artifact-always-parses contract:
  * a failed row's NaN exponent serializes as JSON null (never a bare
  * NaN/Infinity token), noise rows land in `noise_suspect`, and the
  * line survives a naive JSON parse. Mirrors BenchAggregationSpec's
  * role for Bench's artifact. */
class ScaleProbeArtifactSpec extends AnyFunSuite {

  private val ok: ScaleProbe.ProbeRow =
    ("dd7_incremental", 1.45, 1.09, 1.47, 1.03, 0.01, false)
  private val failed: ScaleProbe.ProbeRow =
    ("p4p_daily_increment_asset", 2.5, 1.02, -1.0, 1.0, Double.NaN, true)

  // a JSON-enough parse: balanced braces, no bare NaN/Infinity tokens
  private def assertParses(line: String): Unit = {
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(!line.contains("NaN") && !line.contains("Infinity"), line)
  }

  test("a failed row's exponent serializes as null, row flagged as noise") {
    val line = ScaleProbe.artifactLine(10, Seq(ok, failed))
    assertParses(line)
    assert(line.contains(""""exponent":null"""))
    assert(line.contains(""""sf1_warm":-1.0"""))
    assert(line.contains(""""noise_suspect":["p4p_daily_increment_asset"]"""))
    // the healthy row is untouched
    assert(line.contains(""""dd7_incremental":{"sf01_warm":1.45"""))
  }

  test("all-healthy rows produce an empty noise_suspect and finite numbers") {
    val line = ScaleProbe.artifactLine(10, Seq(ok))
    assertParses(line)
    assert(line.contains(""""noise_suspect":[]"""))
    assert(!line.contains("null"))
  }

  test("an Infinity spread (guarded upstream, belt-and-braces here) nulls out") {
    val inf: ScaleProbe.ProbeRow =
      ("q32_substring_overlap", 0.0, Double.PositiveInfinity, 1.0, 1.0,
        Double.NegativeInfinity, true)
    assertParses(ScaleProbe.artifactLine(10, Seq(inf)))
  }
}
