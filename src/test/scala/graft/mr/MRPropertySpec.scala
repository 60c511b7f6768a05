package graft.mr

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5): the facade's wordcount equals a
  * reference in-memory count for arbitrary documents; partition routing
  * is always in range. (Plain scalacheck generators driven from fixed
  * seeds — the scalatest bridge artifact isn't available offline.) */
class MRPropertySpec extends AnyFunSuite with SparkSpec {
  import MapReduce._
  import MRFixtures._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val docGen: Gen[List[String]] =
    Gen.listOfN(5, Gen.listOfN(8, Gen.oneOf("apple", "pear", "fig", "kiwi", "x1"))
      .map(_.mkString(" ")))

  test("facade wordcount equals in-memory wordcount for random docs") {
    samples(docGen, 5).foreach { docs =>
      val s = spark
      val expected = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toString }
      val got = CorralJob(new TokenMapper, new CountReducer)
        .runOnLines(s.createDataset(docs)(stringEncoder)).collect().toMap
      assert(got == expected)
    }
  }

  test("partition function output is always within [0, numBins)") {
    val cases = samples(Gen.zip(Gen.alphaNumStr, Gen.chooseNum(1, 64)), 100)
    assert(cases.nonEmpty)
    cases.foreach { case (key, n) =>
      val bin = new FuncPartitioner(n, (k, nb) => math.abs(k.hashCode % nb))
        .getPartition(key)
      assert(bin >= 0 && bin < n)
    }
  }
}
