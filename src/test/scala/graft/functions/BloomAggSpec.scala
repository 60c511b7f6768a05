package graft.functions

import graft.functions.Aggregators.BloomAgg
import org.scalatest.funsuite.AnyFunSuite

class BloomAggSpec extends AnyFunSuite {
  private val M = 4096
  private val K = 3

  private def sketch(xs: Seq[Long], agg: BloomAgg = new BloomAgg(M, K)): Array[Byte] =
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce))

  test("no false negatives, ever") {
    val keys = (1L to 500L).map(_ * 7919L)
    val b = sketch(keys)
    assert(keys.forall(HashKernels.bloomMightContain(b, _, K)))
  }

  test("false-positive rate is near the (1-e^(-kn/m))^k prediction") {
    val n = 300
    val b = sketch((1L to n.toLong).map(_ * 104729L))
    val probes = (1L to 20000L).map(_ * 15485863L + 11L)
    val fp = probes.count(HashKernels.bloomMightContain(b, _, K))
    val predicted = math.pow(1 - math.exp(-K.toDouble * n / M), K)
    assert(fp.toDouble / probes.size < 4 * predicted + 0.001,
      s"fp rate ${fp.toDouble / probes.size} vs predicted $predicted")
    assert(fp > 0) // the sketch is genuinely approximate at this sizing
  }

  test("merge of partition sketches equals the single-pass sketch") {
    val agg = new BloomAgg(M, K)
    val xs = (1L to 400L).map(_ * 31L)
    val (l, r) = xs.splitAt(137)
    val merged = agg.merge(sketch(l, agg), sketch(r, agg))
    assert(java.util.Arrays.equals(merged, sketch(xs, agg)))
  }

  test("reduce does not mutate the shared zero buffer") {
    val agg = new BloomAgg(M, K)
    val z = agg.zero
    agg.reduce(z, 42L)
    assert(z.forall(_ == 0))
  }

  test("geometry is validated") {
    intercept[IllegalArgumentException](new BloomAgg(12, 3)) // not a byte multiple
    intercept[IllegalArgumentException](new BloomAgg(4096, 0))
  }
}
