package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The oracle pins determinism (DuckDB replays the sketch exactly);
  * this pins that the estimate is actually a good one, and that merge
  * order / partitioning cannot change the result. */
class HllAggregatorSpec extends AnyFunSuite {
  import Aggregators.{Hll, HllDistinct}

  private def sketch(xs: Seq[Long]): Array[Byte] =
    xs.foldLeft(HllDistinct.zero)(HllDistinct.reduce)

  test("estimate is within 3-sigma relative error (1.04/sqrt(64) ~= 13%)") {
    for (n <- Seq(100, 1000, 10000, 50000)) {
      val est = HllDistinct.finish(sketch((1L to n.toLong).map(_ * 7919L)))
      val rel = math.abs(est - n) / n
      assert(rel < 0.39, s"n=$n est=$est rel=$rel")
    }
  }

  test("M=1024 keeps relative error under 5% on a 100k-distinct fixture") {
    val agg = new Aggregators.HllDistinctAgg(new Aggregators.HllParams(1024))
    val est = agg.finish(
      (1L to 100000L).map(_ * 6364136223846793005L).foldLeft(agg.zero)(agg.reduce))
    val rel = math.abs(est - 100000) / 100000.0
    assert(rel <= 0.05, s"est=$est rel=$rel")
  }

  test("small-range linear counting corrects low-cardinality estimates") {
    for (n <- Seq(5, 20, 60)) {
      val xs = (1L to n.toLong).map(_ * 7919L)
      val buf = xs.foldLeft(HllDistinct.zero)(HllDistinct.reduce)
      // the raw harmonic estimate is in the correction regime here
      assert(Hll.rawEstimate(buf) <= 2.5 * Hll.M)
      val est = HllDistinct.finish(buf)
      assert(math.abs(est - n) / n < 0.25, s"n=$n est=$est")
      // finish took the linear-counting branch (pure function of zeros)
      val zeros = buf.count(_ == 0)
      assert(est == Hll.linearCount(zeros))
    }
  }

  test("duplicates do not move the estimate") {
    val xs = (1L to 500L).map(_ * 31L)
    val once = HllDistinct.finish(sketch(xs))
    val thrice = HllDistinct.finish(sketch(xs ++ xs ++ xs))
    assert(once == thrice)
  }

  test("merge of partition sketches equals the single-pass sketch") {
    val xs = (1L to 2000L).map(_ * 104729L)
    val whole = sketch(xs)
    val parts = xs.grouped(173).map(sketch).reduce(HllDistinct.merge)
    assert(whole.toSeq == parts.toSeq)
    // and in either merge order
    val partsRev = xs.grouped(173).toSeq.reverse.map(sketch).reduce(HllDistinct.merge)
    assert(whole.toSeq == partsRev.toSeq)
  }

  test("ranks are capped and buckets in range") {
    for (x <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)) {
      assert(Hll.bucket(x) >= 0 && Hll.bucket(x) < Hll.M)
      assert(Hll.rank(x) >= 1 && Hll.rank(x) <= Hll.RankCap)
    }
  }
}
