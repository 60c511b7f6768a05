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

  test("typed facade equals the string facade on random docs") {
    // same hooks, different serialization layer — results must agree
    final class TypedTokenMapper extends TypedMapper[String, String, Int] {
      def map(line: String): IterableOnce[(String, Int)] =
        line.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1))
    }
    final class TypedCountReducer extends TypedReducer[String, Int, (String, Long)] {
      def reduce(key: String, vs: Iterator[Int]): IterableOnce[(String, Long)] =
        Iterator(key -> vs.map(_.toLong).sum)
    }
    val s = spark
    implicit val kiEnc: org.apache.spark.sql.Encoder[(String, Int)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaInt)
    implicit val slEnc: org.apache.spark.sql.Encoder[(String, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong)
    samples(docGen, 5).foreach { docs =>
      val stringForm = CorralJob(new TokenMapper, new CountReducer)
        .runOnLines(s.createDataset(docs)(stringEncoder))
        .collect().map { case (w, c) => (w, c.toLong) }.toMap
      val typedForm = TypedJob(new TypedTokenMapper, new TypedCountReducer)(
          kiEnc, stringEncoder, slEnc)
        .run(s.createDataset(docs)(stringEncoder))
        .collect().toMap
      assert(typedForm == stringForm)
    }
  }
}
