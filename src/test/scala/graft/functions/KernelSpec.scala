package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Each native kernel is checked against an independent formulation:
  * the composed Spark built-in chain (for shingles/intersection, on the
  * real corpus) or a direct Scala reference implementation (for the
  * hash signatures, on generated inputs). */
class KernelSpec extends AnyFunSuite with SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L * i)))

  test("shingleHashes equals the composed split/transform/poly-hash chain") {
    HashFunctions.register(spark)
    val docs = Tables.documents(spark, sf0001).limit(100)
    val composed = HashFunctions.sortedHashSet(
      graft.functions.TextFunctions.shingles3(col("text")))
    val diff = docs.select(
      HashFunctions.shingleHashes(col("text")).as("a"), composed.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("wordNGrams equals the split/transform tower, incl. split edge cases") {
    HashFunctions.register(spark)
    import spark.implicits._
    // the corpus plus adversarial whitespace: leading/trailing spaces
    // (trimmed), leading/trailing TABS (NOT trimmed — split limit=-1
    // keeps the empty edge tokens), interior runs, empty, short
    val edge = Seq("", " ", "  \t ", "a", "a b", " a  b ", "\ta b\t",
      "a\t\tb c", "x \n y", "one two three four five")
    val df = Tables.documents(spark, sf0001).select(col("text"))
      .union(edge.toDF("text"))
    for (n <- Seq(1, 2, 3, 4)) {
      val tower = graft.functions.TextFunctions.wordGrams(
        split(trim(col("text")), "\\s+"), n)
      val diff = df.select(
          HashFunctions.wordNGrams(col("text"), n).as("a"), tower.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"kernel vs tower mismatch at n=$n")
    }
  }

  test("sortedIntersectCount equals size(array_intersect) on sorted sets") {
    val gen = Gen.zip(
      Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted),
      Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted))
    samples(gen, 50).foreach { case (a, b) =>
      val got = HashKernels.sortedIntersectCount(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(got == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
  }

  test("simhashP equals a direct affine-vote reference") {
    import PolyHashConstants.{Half, P, SimA, SimB}
    def reference(hs: Seq[Long]): Long =
      (0 until 64).foldLeft(0L) { (sig, b) =>
        val votes = hs.map { raw =>
          val h = java.lang.Math.floorMod(raw, P)
          if ((h * SimA(b) + SimB(b)) % P >= Half) 1 else -1
        }.sum
        if (votes >= 0) sig | (1L << b) else sig
      }
    samples(Gen.listOf(Gen.long), 30).foreach { hs =>
      val got = HashKernels.simhashP(new GenericArrayData(hs.toArray))
      assert(got == reference(hs), s"hs=$hs")
    }
  }

  test("simhashText equals the composed split/distinct/hash/vote chain") {
    HashFunctions.register(spark)
    val composed = call_function("simhash_p",
      transform(array_distinct(split(trim(col("s")), "\\s+")),
        t => HashFunctions.strHashP(t)))
    val corpus = Tables.documents(spark, sf0001).limit(100)
      .select(col("text").as("s"))
    val weird = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("   "), Tuple1("one"), Tuple1("a a a b"),
      Tuple1("\ttab lead"), Tuple1("trail tab\t"), Tuple1("ab"),
      Tuple1(" spaced out "))).toDF("s")
    Seq(corpus, weird).foreach { df =>
      val diff = df.select(HashFunctions.simhashText(col("s")).as("a"), composed.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0)
    }
  }

  test("strHashP equals a direct code-point fold, incl. non-BMP input") {
    import PolyHashConstants.{B, P}
    def reference(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * B + cp) % P)
    val cases = Seq("", "a", "hello world", "ünïcödé", "的是了",
      "emoji 😀 tail", "mixed 的 ascii")
    (cases ++ samples(Gen.asciiPrintableStr, 20)).foreach { s =>
      assert(HashKernels.strHashP(UTF8String.fromString(s)) == reference(s), s"s=$s")
    }
  }

  test("minhashSig equals the per-function affine minimum") {
    import MinHashConstants._
    samples(Gen.nonEmptyListOf(Gen.long), 30).foreach { hs =>
      val got = HashKernels.minhashSig(new GenericArrayData(hs.toArray))
        .toLongArray()
      val exp = (0 until K).map { j =>
        hs.map { raw =>
          val h = java.lang.Math.floorMod(raw, Prime)
          java.lang.Math.floorMod(h * As(j) + Bs(j), Prime)
        }.min
      }
      assert(got.toSeq == exp, s"hs=$hs")
    }
  }

  test("lshSignatures equals a direct hyperplane-sign reference") {
    def reference(v: Seq[Float], tables: Int, planes: Int): Seq[Long] = {
      val P = PolyHashConstants.P
      def coef(t: Int, p: Int, d: Int): Double = {
        val h0 = (t.toLong * 7919L + p.toLong * 104729L + d.toLong * 13007L) % P
        val h1 = (h0 * h0 + 2531011L) % P
        val h2 = (h1 * 1103515245L + 12345L) % P
        val h3 = (h2 * h2 + 2531011L) % P
        h3.toDouble / P - 0.5
      }
      (0 until tables).map { t =>
        (0 until planes).foldLeft(0L) { (sig, p) =>
          val dot = v.indices.foldLeft(0.0) { (acc, d) =>
            acc + v(d).toDouble * coef(t, p, d)
          }
          if (dot >= 0) sig | (1L << p) else sig
        }
      }
    }
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-5.0f, 5.0f))
    samples(vecGen, 20).foreach { v =>
      val got = HashKernels.lshSignatures(
        new GenericArrayData(v.toArray), 4, 12).toLongArray()
      assert(got.toSeq == reference(v, 4, 12))
    }
  }

  test("winnow: rolling hash equals the direct polynomial; containment holds") {
    import PolyHashConstants.P
    val k = 8; val w = 4
    def direct(s: String): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < k) return Seq.empty
      val hs = (0 to cps.length - k).map { i =>
        cps.slice(i, i + k).foldLeft(0L)((h, c) => (h * 257L + c) % P)
      }
      if (hs.length < w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq.distinct.sorted
    }
    val strGen = Gen.listOfN(40, Gen.alphaChar).map(_.mkString)
    samples(strGen, 20).foreach { s =>
      val got = HashKernels.winnow(UTF8String.fromString(s), k, w).toLongArray()
      assert(got.toSeq == direct(s), s"s=$s")
    }
    // a shared 200-char prefix guarantees shared fingerprints
    val base = samples(Gen.listOfN(200, Gen.alphaChar).map(_.mkString), 1).head
    val a = HashKernels.winnow(UTF8String.fromString(base + " tail one"), k, w)
      .toLongArray().toSet
    val b = HashKernels.winnow(UTF8String.fromString(base + " other end"), k, w)
      .toLongArray().toSet
    assert(a.intersect(b).size.toDouble / a.size > 0.5)
  }

  test("tokenizeWords equals the regex tower on corpus and adversarial strings") {
    HashFunctions.register(spark)
    val tower = filter(
      split(lower(regexp_replace(col("s"), "[^a-zA-Z0-9\\s]+", " ")), "\\s+"),
      w => w =!= "")
    val corpus = Tables.documents(spark, sf0001).limit(100)
      .select(col("text").as("s"))
    val weird = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("  "), Tuple1("a-b_c!d"), Tuple1("ABC 123 m1x3d"),
      Tuple1("tab\there\nnewline"), Tuple1("ünïcödé wörds"), Tuple1("...!!!"),
      Tuple1("trailing space "), Tuple1(" leading"))).toDF("s")
    Seq(corpus, weird.select(col("s"))).foreach { df =>
      val diff = df.select(
        HashFunctions.tokenizeWords(col("s")).as("a"), tower.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0)
    }
  }

  test("topGramCount equals the nested-HOF top-gram scan, incl. >1k-token docs") {
    HashFunctions.register(spark)
    import spark.implicits._
    val corpus = Tables.documents(spark, sf0001).limit(100).select(col("text"))
    // >1k-token docs from a tiny vocab (dense repetition — the worst
    // case for the quadratic HOF form this kernel replaces) + edges
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val longDocs = (1 to 5).map(_ =>
      (1 to 1500).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val edge = Seq("", " ", "a", "a b", "a a a a", "\ta b\t", "x y x y x y")
    val df = corpus.union((longDocs ++ edge).toDF("text"))
    for (n <- Seq(2, 3)) {
      val g = HashFunctions.wordNGrams(col("text"), n)
      val hof = aggregate(array_distinct(g), lit(0), (acc, gg) =>
        greatest(acc, size(filter(g, x => x === gg))))
      val diff = df.select(
          HashFunctions.topGramCount(col("text"), n).as("a"), hof.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"kernel vs HOF mismatch at n=$n")
    }
  }

  test("winnow fingerprint guard survives short docs under ANSI mode") {
    HashFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (1L, "ab"), (2L, ""), (3L, "a document long enough to fingerprint")))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        HashFunctions.winnowFingerprints(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        when(size(col("fps")) > 0, element_at(col("fps"), 1)).as("fp_min"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getInt(1) == 0 && rows(0).isNullAt(2)) // "ab": no crash
    assert(rows(1).getInt(1) == 0 && rows(1).isNullAt(2)) // "": no crash
    assert(rows(2).getInt(1) > 0 && !rows(2).isNullAt(2))
  }

  test("shingleHashes handles degenerate inputs") {
    def sh(s: String) =
      HashKernels.shingleHashes(UTF8String.fromString(s)).numElements()
    assert(sh("") == 0)
    assert(sh("one two") == 0)          // < 3 tokens
    assert(sh("one two three") == 1)
    assert(sh("  a   b \t c  ") == 1)   // whitespace runs + edges
    assert(sh("a b c a b c a b c") > 0)
  }
}
