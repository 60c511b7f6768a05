package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The library API on AD-HOC DataFrames (not the fixture tables) — what
  * an actual user does. The fixture queries pin exact values via the
  * oracle; this pins that the operators are genuinely reusable:
  * caller's column names, caller's data, sensible outputs. */
class ApiSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "completely different content about spark engines and shuffling"),
    (6L, "short"))).toDF("my_id", "body")

  test("Dedup.exactGroups groups exact duplicates under caller's columns") {
    val g = Dedup.exactGroups(docs, "my_id", "body").collect()
    assert(g.map(_.getLong(2)).sum == 6) // every doc accounted for
    val dup = g.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keeper is min id
  }

  test("Dedup.jaccardPairs finds the near-dup, not the unrelated pair") {
    val pairs = Dedup.jaccardPairs(docs, "my_id", "body",
        bands = 16, rows = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).size == 1 &&
      Set(a, b).intersect(Set(1L, 2L, 3L)).size == 1 })
    intercept[IllegalArgumentException](
      Dedup.jaccardPairs(docs, "my_id", "body", 5, 5, 0.5))
  }

  test("Dedup.simhashPairs flags the exact dup pair at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "my_id", "body")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0))
  }

  test("Dedup.embeddingPairs verifies exact cosine inside LSH buckets") {
    val vecs = spark.createDataFrame(Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(1.0f, 0.01f, 0.0f)),  // near-dup of 10
      (12L, Array(0.0f, 1.0f, 0.0f)))).toDF("vid", "v")
    val pairs = Dedup.embeddingPairs(vecs, "vid", "v",
        tables = 8, planes = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L)))
  }

  test("Sampling is deterministic, per-stratum, and near the asked rate") {
    val s = spark
    import s.implicits._
    val rows = (0L until 4000L).map(i => (i, if (i % 4 == 0L) "en" else "xx"))
    val df = rows.toDF("rid", "grp")
    val sampled = Sampling.stratified(df, "grp", "rid",
      Map("en" -> 0.2), default = 0.8)
    val counts = sampled.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") / 1000.0 - 0.2) < 0.05)
    assert(math.abs(counts("xx") / 3000.0 - 0.8) < 0.05)
    // a rerun keeps the identical rows (pure function of id — task
    // retries cannot change the sample)
    val ids1 = sampled.select("rid").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratified(df, "grp", "rid", Map("en" -> 0.2), 0.8)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    assert(Sampling.uniform(df, "rid", 0.0).count() == 0)
    assert(Sampling.uniform(df, "rid", 1.0).count() == 4000)
    intercept[IllegalArgumentException](
      Sampling.stratified(df, "grp", "rid", Map("en" -> 1.5)))
  }

  test("duplicateGroups finds connected components, including long chains") {
    // components: {1..5} as a pure path (diameter 4 — forces several
    // propagation rounds), {10,11,12} as a triangle, {20,21} as a pair
    val pairs = spark.createDataFrame(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L))).toDF("x", "y")
    val got = Dedup.duplicateGroups(pairs, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("star-contraction components equal label propagation; chains stay cheap") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val df = spark.createDataFrame(edges).toDF("x", "y")
      val prop = Dedup.duplicateGroups(df, "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.duplicateGroupsStar(df, "x", "y")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop)
    }
    // a 40-node chain has diameter 39: label propagation would need 39
    // rounds, star contraction converges in O(log^2) — run only star
    val chain = (0L until 39L).map(i => (i, i + 1))
    val g = Dedup.duplicateGroupsStar(
        spark.createDataFrame(chain).toDF("x", "y"), "x", "y", maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == (0L to 39L).map(_ -> 0L).toMap)
  }

  test("multi-probe LSH recall >= 0.9 on planted pairs in the cos~0.4-0.5 regime") {
    // Planted-pair fixture: 60 random unit vectors (fixed seed —
    // deterministic), each with a partner at a known cosine in
    // [0.42, 0.50], i.e. exactly the low-similarity regime where
    // one-shot 8x6 hyperplane LSH has recall ~0.5.
    val rnd = new scala.util.Random(42)
    val d = 64
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = (0 until 60).map(_ => unit(Array.fill(d)(rnd.nextGaussian())))
    val rows = base.zipWithIndex.flatMap { case (u, i) =>
      val c = 0.42 + 0.08 * (i / 59.0)
      val w0 = Array.fill(d)(rnd.nextGaussian())
      val proj = (0 until d).map(k => u(k) * w0(k)).sum
      val w = unit((0 until d).map(k => w0(k) - proj * u(k)).toArray)
      val partner = (0 until d).map(k => c * u(k) + math.sqrt(1 - c * c) * w(k)).toArray
      Seq((i.toLong, u.map(_.toFloat)), (1000L + i, partner.map(_.toFloat)))
    }
    val vecs = spark.createDataFrame(rows).toDF("vid", "v")
    // ground truth by brute force on the float-rounded vectors
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        (0 until d).map(k => x(k).toDouble * y(k).toDouble).sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val truth = (for {
      x <- rows; y <- rows if x._1 < y._1 && cos(x._2, y._2) >= 0.4
    } yield (x._1, y._1)).toSet
    assert(truth.size >= 60) // the 60 planted pairs, plus any incidental ones
    def found(probes: Int): Set[(Long, Long)] =
      Dedup.embeddingPairs(vecs, "vid", "v", tables = 8, planes = 6,
          threshold = 0.4, probes = probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = found(6)
    assert(multi.subsetOf(truth)) // exact verification: no false positives
    val recall = multi.size.toDouble / truth.size
    assert(recall >= 0.9, s"multi-probe recall $recall (${multi.size}/${truth.size})")
    // the one-shot leg sits in the collapse regime the r15 model-recall
    // guard rejects (model 0.41 < the 0.5 floor at 8x6/0.4/probes=0) —
    // measuring it is the point here, so downgrade to warn
    spark.conf.set(Similarity.LshSizingConfKey, "warn")
    try assert(found(0).size < multi.size) // one-shot misses pairs multi-probe finds
    finally spark.conf.unset(Similarity.LshSizingConfKey)
  }

  test("Similarity.cosineTopK ranks the closest vector first") {
    val corpus = spark.createDataFrame(Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)))).toDF("id", "emb")
    val queries = corpus.filter(col("id") === 1L)
    val top = Similarity.cosineTopK(corpus, queries, "id", "emb", 2)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 3L)) // nearest first
  }

  test("Temporal.asofJoin picks the latest quote at-or-before each probe") {
    val quotes = spark.createDataFrame(Seq(
      (1L, 100L, 501L), (1L, 200L, 502L), (2L, 150L, 503L)))
      .toDF("k", "t", "qid")
    val probes = spark.createDataFrame(Seq(
      (1L, 150L, 901L), (1L, 250L, 902L), (2L, 100L, 903L), (3L, 100L, 904L)))
      .toDF("k", "t", "qid")
    val out = Temporal.asofJoin(probes, quotes, "k", "t", "qid")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(901L) == ((501L, 50L)))  // latest quote <= 150 is t=100
    assert(out(902L) == ((502L, 50L)))  // latest quote <= 250 is t=200
    assert(!out.contains(903L))         // user 2's quote is later than probe
    assert(!out.contains(904L))         // user 3 has no quotes
  }

  test("Temporal.rangeJoin emits every in-window pair exactly once") {
    val quotes = spark.createDataFrame(Seq(
      (1L, 95L, 501L), (1L, 60L, 502L), (1L, 10L, 503L)))
      .toDF("k", "t", "qid")
    val probes = spark.createDataFrame(Seq((1L, 100L, 901L)))
      .toDF("k", "t", "qid")
    val out = Temporal.rangeJoin(probes, quotes, "k", "t", "qid", window = 50L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((501L, 5L), (502L, 40L))) // 503 (gap 90) is outside
  }

  test("TopKPerKey returns the k best per key with deterministic ties") {
    val df = spark.createDataFrame(Seq(
      (1L, 10.0, 100L), (1L, 30.0, 101L), (1L, 20.0, 102L), (1L, 30.0, 103L),
      (2L, 5.0, 200L))).toDF("grp", "score", "rid")
    val top = TopKPerKey(df, "grp", "score", "rid", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // grp 1: two scores of 30.0 — tie breaks on rid asc (101 before 103)
    assert(top == Set((1L, 101L, 1), (1L, 103L, 2), (2L, 200L, 1)))
  }

  test("TopKPerKey is exact past k = 255 (the count-byte overflow regression)") {
    // The buffer's entry count was one byte: k > 255 wrapped at 256 and
    // corrupted the aggregate (RecallProbe r13 — pqTopK at rerank 500
    // returned recall 0.0 where rerank 50 returned 0.43). rerank is a
    // scale knob that grows with the corpus, so k must be unbounded.
    import spark.implicits._
    val k = 500
    val df = (0 until 2000).map(i => (1L, (i * 7919 % 2000).toDouble, i.toLong))
      .toDF("grp", "score", "rid")
    val got = TopKPerKey(df, "grp", "score", "rid", k)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == k)
    // equals the window-function formulation
    val want = df.collect().map(r => (r.getDouble(1), r.getLong(2)))
      .sortBy { case (s, id) => (-s, id) }.take(k).zipWithIndex
      .map { case ((s, id), i) => (id, s, i + 1) }
    assert(got.sortBy(_._3).toSeq == want.toSeq)
  }

  test("dedup operators survive null text / null vectors under ANSI mode") {
    val withNulls = spark.createDataFrame(Seq(
      (1L, "some real content here for the shingles to chew on"),
      (2L, null.asInstanceOf[String]),
      (3L, ""))).toDF("my_id", "body")
    // null/empty rows contribute no pairs, and nothing throws
    assert(Dedup.jaccardPairs(withNulls, "my_id", "body", 16, 2, 0.5).count() == 0)
    assert(Dedup.simhashPairs(withNulls, "my_id", "body")
      .collect().forall(r => r.getLong(0) != 2L && r.getLong(1) != 2L))
    assert(Dedup.exactGroups(withNulls, "my_id", "body").count() == 3) // null, "", text
    val vecNulls = spark.createDataFrame(Seq(
      (1L, Array(1.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]])))
      .toDF("vid", "v")
    assert(Dedup.embeddingPairs(vecNulls, "vid", "v", 4, 2, 0.5).count() == 0)
  }

  test("Sketches CMS estimates dominate true counts and match sans collision") {
    val s = spark
    import s.implicits._
    val words = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(3)("gamma") ++ (1 to 200).map(i => s"noise$i")).toDF("w")
    val sketch = Sketches.cmsSketch(words, "w")
    val probes = Seq("alpha", "beta", "gamma").toDF("w")
    val est = Sketches.cmsEstimate(sketch, probes, "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 50 && est("beta") >= 20 && est("gamma") >= 3)
    // 273 keys in 1024 cells x 4 rows: min-over-rows collisions are
    // unlikely to inflate ALL three estimates
    assert(est("alpha") < 60)
  }

  test("Sketches.hllDistinct estimates within tolerance on ad-hoc data") {
    val s = spark
    import s.implicits._
    val df = (1L to 5000L).map(_ * 13L).toDF("uid")
    val est = Sketches.hllDistinct(df, "uid").head().getDouble(0)
    assert(math.abs(est - 5000) / 5000 < 0.39, s"est=$est")
  }
}
