package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 corpus-quality operators: repetition stats, PII redaction,
  * benchmark decontamination, token-budget sampling. */
class QualitySpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sf0001)

  test("t7 repetition stats on a hand-computed planted document") {
    import spark.implicits._
    val df = Seq((1L, "a b a b c", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val toks = split(trim(col("text")), "\\s+")
    val g2 = graft.functions.TextFunctions.wordGrams(toks, 2)
    val g3 = graft.functions.TextFunctions.wordGrams(toks, 3)
    val row = df.select(
      size(toks).as("n"),
      size(array_distinct(toks)).as("u"),
      g2.as("g2"), g3.as("g3")).head()
    // "a b a b c": toks=5, uniq=3; 2-grams = [a b, b a, a b, b c] (top "a b"=2 of 4)
    // 3-grams = [a b a, b a b, a b c] (all distinct)
    assert(row.getInt(0) == 5 && row.getInt(1) == 3)
    assert(row.getSeq[String](2) == Seq("a b", "b a", "a b", "b c"))
    assert(row.getSeq[String](3) == Seq("a b a", "b a b", "a b c"))
  }

  test("t7 repetition fractions are in range and non-degenerate on sf0.001") {
    val rows = run("t7_repetition").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (u, t2, d3) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(u > 0.0 && u <= 1.0)
      assert(t2 >= 0.0 && t2 <= 1.0)
      assert(d3 >= 0.0 && d3 < 1.0)
    }
    // the synthetic word soup from a small vocab must show SOME repetition
    assert(rows.exists(_.getDouble(3) > 0.0))
    assert(rows.exists(_.getDouble(2) < 1.0))
  }

  test("t8 planted emails/phones are found and redacted") {
    val rows = run("t8_pii_redact").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (if (id % 3 == 0) 1 else 0), s"emails for doc $id")
      assert(r.getInt(2) == (if (id % 5 == 0) 1 else 0), s"phones for doc $id")
      assert(r.getString(3).length == 32) // md5 hex
    }
  }

  test("t8 redaction removes the PII from the fingerprinted text") {
    // doc 15 gets BOTH an email and a phone; its redacted fingerprint
    // must equal the fingerprint of the hand-redacted augmented text
    import spark.implicits._
    val doc = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 15).select("text").head().getString(0)
    val expected = doc + " contact user15@mail.example.com now" +
      " call 555-0015 today"
    val handRedacted = expected
      .replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
      .replaceAll("555-[0-9]{4}", "<PHONE>")
    assert(handRedacted.contains("<EMAIL>") && handRedacted.contains("<PHONE>"))
    val fp = run("t8_pii_redact").filter(col("doc_id") === 15)
      .head().getString(3)
    val expFp = Seq(handRedacted).toDF("t")
      .select(md5(col("t").cast("binary"))).head().getString(0)
    assert(fp == expFp)
  }

  test("q31 decontamination removes exactly the 4-gram-overlap docs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val clean = run("q31_decontaminate")
    val corpusN = docs.filter(col("source") =!= "src0").count()
    val cleanN = clean.count()
    assert(cleanN > 0 && cleanN < corpusN,
      s"decontamination must be non-degenerate: kept $cleanN of $corpusN")
    // no clean doc may share a 4-gram with the benchmark slice
    val toks = split(trim(col("text")), "\\s+")
    val grams = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(
        graft.functions.TextFunctions.wordGrams(toks, 4))).as("g"))
    val benchG = grams.filter(col("source") === "src0").select("g").distinct()
    val overlap = clean.join(grams, "doc_id").join(benchG, "g")
    assert(overlap.count() == 0)
  }

  test("ds3 domain mix: computed keep rates approach the target share") {
    val rows = run("ds3_domain_mix").collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(1))
    assert(byLang.keySet.size == 5)
    byLang.foreach { case (lang, rs) =>
      val rate = rs.head.getDouble(3)
      assert(rate > 0.0 && rate <= 1.0, s"$lang keep_rate $rate")
      // kept tokens should land near the per-language share (10000/5)
      // when the rate binds (rate < 1); generous bound — it's a
      // Bernoulli sample, not an exact cap
      val kept = rs.map(_.getLong(2)).sum
      if (rate < 1.0) assert(kept < 2L * 2000, s"$lang kept $kept tokens")
    }
  }

  test("ds2 threshold (scale path) equals the exact window form") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
    val exact = graft.api.Sampling
      .tokenBudget(docs, "lang", "doc_id", "n_tokens", 2000L)
      .collect().map(_.toString).sorted.toSeq
    val twoPhase = graft.api.Sampling
      .tokenBudgetThreshold(docs, "lang", "doc_id", "n_tokens", 2000L)
      .collect().map(_.toString).sorted.toSeq
    assert(twoPhase == exact)
    // and with a clamping threshold (budget >= stratum totals) nothing
    // is pre-filtered at all
    val all = graft.api.Sampling
      .tokenBudgetThreshold(docs, "lang", "doc_id", "n_tokens", 1000000L)
      .count()
    assert(all == docs.count())
  }

  test("q32 substring overlap finds every exact-duplicate pair") {
    import org.apache.spark.sql.functions.col
    val pairs = run("q32_substring_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    // independent check: recompute each doc's fingerprint set and
    // verify (a) every reported pair truly shares >= 2 fingerprints and
    // (b) no sharing pair was missed (exhaustive over the 500-doc set)
    graft.functions.HashFunctions.register(spark)
    val raw = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.HashFunctions.winnowFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // replay the shipped hot-fingerprint cap (fps in > 256 docs drop)
    val docFreq = raw.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size)
    val fps = raw.view.mapValues(_.filter(f => docFreq(f) <= 256)).toMap
    val expected = (for {
      a <- fps.keys; b <- fps.keys if a < b
      if fps(a).intersect(fps(b)).size >= 2
    } yield (a, b)).toSet
    assert(pairs == expected,
      s"extra=${(pairs -- expected).take(3)} missing=${(expected -- pairs).take(3)}")
  }

  test("q32 hot-fingerprint cap bounds the self-join fan-out") {
    import spark.implicits._
    graft.functions.HashFunctions.register(spark)
    val boiler = "this boilerplate footer sentence is repeated verbatim " +
      "across every single document in the whole fixture corpus"
    val shared = "a long duplicated passage that appears only in the " +
      "first two documents and nowhere else at all"
    val n = 50
    val docs = (0L until n.toLong).map { i =>
      val extra = if (i < 2) s" $shared" else ""
      (i, s"document number $i payload alpha$i beta$i gamma$i$extra $boiler")
    }.toDF("doc_id", "text")
    val cap = 10
    val pairs = TextQueries.substringOverlapPairs(docs, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the genuine duplicate pair survives; the boilerplate-only mass
    // (all 1225 pairs would share the footer's fps) does not
    assert(pairs.contains((0L, 1L)), "planted duplicate pair lost")
    assert(pairs.size < 10, s"boilerplate pairs survived the cap: ${pairs.size}")
    // fan-out bound: after dropping fps in > cap docs, every bucket has
    // <= cap rows, so candidates <= cap/2 · |fp rows| — NOT n²/2 per
    // hot fingerprint. Verify against the recomputed doc-frequency.
    val fpRows = docs.select(col("doc_id"),
        explode(graft.functions.HashFunctions.winnowFingerprints(col("text")))
          .as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val freq = fpRows.groupBy(_._2).view.mapValues(_.size).toMap
    val cold = fpRows.filter { case (_, f) => freq(f) <= cap }
    val capped = cold.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val uncapped = fpRows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(capped <= cap.toLong * fpRows.length / 2,
      s"capped candidates $capped exceed the cap·n bound")
    // and the cap genuinely bites: the boilerplate fps alone fan out
    // ~n²/2 candidates per fingerprint without it
    assert(uncapped > n.toLong * (n - 1) / 2,
      s"fixture failed to produce a hot fingerprint (uncapped=$uncapped)")
    assert(capped < uncapped / 10, s"cap barely reduced fan-out: $capped vs $uncapped")
    // an unbinding cap keeps the boilerplate pairs (sanity: same plan,
    // full result)
    val uncappedPairs = TextQueries.substringOverlapPairs(docs, 1000).count()
    assert(uncappedPairs == n.toLong * (n - 1) / 2)
  }

  test("tokenBudget refuses cum_tokens input and negative counts") {
    import spark.implicits._
    val clash = Seq((1L, "en", 5L, 0L)).toDF("doc_id", "lang", "n_tokens", "cum_tokens")
    val e = intercept[IllegalArgumentException] {
      graft.api.Sampling.tokenBudget(clash, "lang", "doc_id", "n_tokens", 10L)
    }
    assert(e.getMessage.contains("cum_tokens"))
    val neg = Seq((1L, "en", 5L), (2L, "en", -3L)).toDF("doc_id", "lang", "n_tokens")
    val thrown = intercept[Throwable] {
      graft.api.Sampling.tokenBudget(neg, "lang", "doc_id", "n_tokens", 100L).collect()
    }
    assert(thrown.getMessage != null)
  }

  test("tokenBudgetThreshold fails loud when the coarse prefix under-covers") {
    import spark.implicits._
    // One stratum, skewed: 100 one-token rows + a 1000-token row whose
    // priority is LAST (max scramble among the candidates), so at
    // oversample=1 the coarse prefix holds far fewer than `budget`
    // tokens while the stratum total (1100) is binding (> 1·500).
    val cands = (100L until 1100L).toDF("id")
      .select(col("id"), graft.api.Sampling.scramble(col("id")).as("s"))
      .orderBy(col("s").desc).limit(1).collect()
    val bigId = cands.head.getLong(0)
    val rows = (0L until 100L).map(i => (i, "en", 1L)) :+ ((bigId, "en", 1000L))
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      graft.api.Sampling.tokenBudgetThreshold(
        df, "lang", "doc_id", "n_tokens", 500L, oversample = 1.0).collect()
    }
    assert(e.getMessage.contains("raise oversample"), e.getMessage)
  }

  test("histQuantile ignores null values") {
    import spark.implicits._
    val base = (1 to 500).map(i => ("g" + (i % 3), i.toDouble))
      .toDF("grp", "v")
    val withNulls = base.union(
      (1 to 100).map(i => ("g" + (i % 3), null.asInstanceOf[java.lang.Double]))
        .toDF("grp", "v"))
    val a = graft.api.Sketches.histQuantile(base, "grp", "v", Seq(0.5, 0.9))
      .collect().map(_.toString).sorted.toSeq
    val b = graft.api.Sketches.histQuantile(withNulls, "grp", "v", Seq(0.5, 0.9))
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("qs5 histogram quantiles land within one bin width of exact") {
    import org.apache.spark.sql.functions.{col, expr, max => smax, min => smin}
    val li = graft.Tables.lineitem(spark, sf0001)
    val sketch = run("qs5_hist_quantile").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val bounds = li.agg(smin(col("l_extendedprice")), smax(col("l_extendedprice")))
      .head()
    val binW = (bounds.getDouble(1) - bounds.getDouble(0)) / 256.0
    assert(sketch.keySet == exact.keySet)
    sketch.foreach { case (g, (s50, s90)) =>
      assert(math.abs(s50 - exact(g)._1) <= binW, s"$g p50: $s50 vs ${exact(g)._1}")
      assert(math.abs(s90 - exact(g)._2) <= binW, s"$g p90: $s90 vs ${exact(g)._2}")
    }
  }

  test("ds2 token budget: prefix-cap per language, deterministic") {
    val a = run("ds2_token_budget").collect().sortBy(_.getLong(0))
    val b = run("ds2_token_budget").collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // reproducible
    assert(a.nonEmpty)
    // every kept row's running total respects the cap, per language
    assert(a.forall(_.getLong(3) <= 2000L))
    // and the cap binds: each language keeps fewer tokens than it has
    val keptPerLang = a.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val docs = graft.Tables.documents(spark, sf0001)
    val totPerLang = docs.groupBy(col("lang"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keptPerLang.foreach { case (lang, kept) =>
      assert(kept <= 2000L && kept < totPerLang(lang),
        s"$lang kept $kept of ${totPerLang(lang)}")
    }
  }
}
