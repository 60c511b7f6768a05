package graft.operators

import graft.{Registry, SparkSpec}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sf0001)

  test("dd1 exact dedup: fingerprint groups cover all docs") {
    val df = run("dd1_exact_dedup")
    val total = df.agg(sum("n_copies")).head().getLong(0)
    assert(total == 500)
  }

  test("dd2 jaccard pairs are high-similarity and deduplicated") {
    val rows = run("dd2_ngram_jaccard").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) >= 0.5))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("dd3 minhash LSH recalls the planted near-dups (vs exact jaccard)") {
    val exact = run("dd2_ngram_jaccard").filter(col("jac") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("dd3_minhash_lsh")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("dd4 simhash: hamming<=3 pairs include the exact duplicates") {
    val dups = run("dd1_exact_dedup").filter(col("n_copies") > 1)
    val sim = run("dd4_simhash").collect()
    assert(sim.forall(_.getInt(2) <= 3))
    if (dups.count() > 0) assert(sim.nonEmpty)
  }

  test("dd7 incremental ≡ inc-touching subset of full jaccardPairs, via a parquet round-trip of the signature asset") {
    val docs = graft.Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = docs.filter(col("doc_id") % 10 === 0)
    // the corpus signatures go through parquet: the asset a daily
    // pipeline persists once and reuses per increment
    val tmp = java.nio.file.Files.createTempDirectory("dd7sigs").toString
    graft.api.Dedup.minhashSignatures(corpus, "doc_id", "text", 8, 4)
      .write.mode("overwrite").parquet(s"$tmp/corpus_sigs")
    val corpusSigs = spark.read.parquet(s"$tmp/corpus_sigs")
    val incSigs = graft.api.Dedup.minhashSignatures(inc, "doc_id", "text", 8, 4)
    val got = graft.api.Dedup.incrementalJaccardPairs(corpusSigs, incSigs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = graft.api.Dedup.jaccardPairs(docs, "doc_id", "text", 8, 4, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(got == expected)
    assert(got.nonEmpty, "fixture should hold inc-touching jaccard pairs")
    assert(got.forall { case (a, b, _) => a % 10 == 0 || b % 10 == 0 })
    assert(full.exists(p => p._1 % 10 != 0 && p._2 % 10 != 0),
      "fixture should also hold corpus-corpus pairs dd7 must NOT re-find")
  }

  test("dd8 incremental hamming ≡ inc-touching subset of full simhashPairs") {
    graft.functions.HashFunctions.register(spark)
    val docs = graft.Tables.documents(spark, sf0001)
    def sigs(f: org.apache.spark.sql.Column) = docs.filter(f)
      .select(col("doc_id"),
        graft.functions.HashFunctions.simhashText(col("text")).as("sig"))
    val got = graft.api.Dedup.incrementalHammingPairs(
        sigs(col("doc_id") % 10 =!= 0), sigs(col("doc_id") % 10 === 0),
        "doc_id", "sig", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = graft.api.Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(got == expected)
    assert(got.nonEmpty, "fixture should hold inc-touching hamming pairs")
    assert(full.exists(p => p._1 % 10 != 0 && p._2 % 10 != 0),
      "fixture should also hold corpus-corpus pairs dd8 must NOT re-find")
  }

  test("dd9 incremental embedding ≡ inc-touching subset of full embeddingPairs") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    def sigs(f: org.apache.spark.sql.Column) = graft.api.Dedup.lshSignatureTable(
      emb.filter(f), "vec_id", "embedding", 8, 6)
    val got = graft.api.Dedup.incrementalEmbeddingPairs(
        sigs(col("vec_id") % 10 =!= 0), sigs(col("vec_id") % 10 === 0),
        0.3, probes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = graft.api.Dedup.embeddingPairs(emb, "vec_id", "embedding",
        8, 6, 0.3, probes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(got == expected)
    assert(got.nonEmpty, "fixture should hold inc-touching embedding pairs")
  }

  test("dd10 incremental groups ≡ dd6 over corpus ∪ inc restricted to touched components") {
    val docs = graft.Tables.documents(spark, sf0001)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = docs.filter(col("doc_id") % 10 === 0)
    // asset goes through parquet: the persisted form a daily run reads
    val tmp = java.nio.file.Files.createTempDirectory("dd10asset").toString
    graft.api.Dedup.duplicateGroups(
        graft.api.Dedup.jaccardPairs(corpus, "doc_id", "text", 8, 4, 0.8),
        "doc_a", "doc_b")
      .write.mode("overwrite").parquet(s"$tmp/groups")
    val asset = spark.read.parquet(s"$tmp/groups")
    val incPairs = graft.api.Dedup.incrementalJaccardPairs(
      graft.api.Dedup.minhashSignatures(corpus, "doc_id", "text", 8, 4),
      graft.api.Dedup.minhashSignatures(inc, "doc_id", "text", 8, 4), 0.8)
    val got = graft.api.Dedup.incrementalGroups(asset, incPairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.api.Dedup.duplicateGroups(
        graft.api.Dedup.jaccardPairs(docs, "doc_id", "text", 8, 4, 0.8),
        "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val touchedGroups = full.filter(_._1 % 10 == 0).map(_._2)
    val expected = full.filter(r => touchedGroups.contains(r._2))
    assert(got == expected)
    assert(got.nonEmpty, "fixture should hold inc-touched components")
    assert(full.exists(r => !touchedGroups.contains(r._2)),
      "fixture should also hold untouched components dd10 must NOT emit")
  }

  test("dd10 plan: the parquet asset joins via broadcast, never sort-merge") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dd10plan").toString
    try {
      Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 3L))
        .toDF("doc_id", "group_id").write.parquet(s"$tmp/asset")
      val asset = spark.read.parquet(s"$tmp/asset")
      val incPairs = Seq((100L, 3L), (100L, 101L)).toDF("doc_a", "doc_b")
      val df = graft.api.Dedup.incrementalGroups(asset, incPairs, "doc_a", "doc_b")
      df.collect() // materialize so AQE's final plan is in place
      val plan = df.queryExecution.executedPlan.toString
      // the corpus-sized asset must only ever STREAM against broadcasts
      // of increment-sized sides (endpoints, touched groups, new labels)
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast joins over the asset scan, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"asset side shuffled through a sort-merge join:\n$plan")
    } finally {
      import scala.sys.process._
      Seq("rm", "-rf", tmp).!
    }
  }

  test("dd10 handles the bridge-merge and first-time-paired cases") {
    val s = spark
    import s.implicits._
    // two existing groups {1,2} and {10,11}, one untouched group {20,21};
    // doc 50 exists in the corpus but was never paired (not in the asset)
    val asset = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("doc_id", "group_id")
    // inc doc 100 bridges groups 1 and 10; inc doc 101 pairs with the
    // previously-unpaired corpus doc 50
    val incPairs = Seq((100L, 2L), (100L, 10L), (101L, 50L)).toDF("doc_a", "doc_b")
    val got = graft.api.Dedup.incrementalGroups(asset, incPairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L), (100L, 1L),
      (50L, 50L), (101L, 50L)),
      s"merged bridge + new component expected, got $got")
  }

  test("s1 brute-force topk: 5 ranked neighbors per probe, cosine in [-1,1]") {
    val rows = run("s1_cosine_topk").collect()
    assert(rows.length == 50) // 10 probes × k=5
    assert(rows.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.forall { case (_, rs) =>
      rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5) })
  }

  test("s2 LSH ANN returns subsets of the corpus, never the probe itself") {
    val rows = run("s2_ann_lsh").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("s3 IVF ANN: ranked results from probed cells, overlapping brute force") {
    val brute = run("s1_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = run("s3_ann_ivf").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 5))
    val ivf = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = brute.count(ivf.contains).toDouble / brute.size
    assert(overlap > 0.0, "IVF found none of the brute-force neighbors")
  }

  test("s4 trained-codebook IVF: ranked results, brute-force overlap, balanced cells") {
    val brute = run("s1_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = run("s4_ann_ivf_trained").collect()
    assert(rows.length == 50) // 10 probes × k=5
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 5))
    val s4 = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(s4.contains).toDouble / brute.size
    assert(recall >= 0.7, s"trained-IVF recall@5 $recall vs brute force")
    // the codebook's raison d'être: trained cells stay balanced —
    // max cell is bounded relative to the mean (the per-query probe
    // cost bound at corpus scale)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val cells = graft.api.Similarity.kmeansAssign(
      emb, emb.filter(col("vec_id") < 16), "vec_id", "embedding", 2)
      .groupBy("cent_id").count().collect().map(_.getLong(1))
    val maxOverMean = cells.max.toDouble / (cells.sum.toDouble / cells.length)
    assert(maxOverMean < 2.0,
      s"trained cells unbalanced: max/mean $maxOverMean over ${cells.length} cells")
  }

  test("dd11 semantic survivors ≡ independent union-find over within-cluster cosine pairs") {
    // Recompute the whole SemDeDup decision driver-side from first
    // principles: final k-means assignment from the library call, then
    // brute-force within-cluster cosine pairs, union-find components,
    // keeper = min (ccos, id) per component — and demand exact set
    // equality with the operator's survivors.
    val emb = graft.Tables.embeddings(spark, sf0001)
    val assigned = graft.api.Similarity.kmeansAssign(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 2)
      .select("vec_id", "cent_id", "ccos", "embedding").collect()
    assert(assigned.length == 500)
    assert(assigned.map(_.getLong(0)).distinct.length == 500,
      "kmeansAssign must assign every vector exactly once")
    val vecs = assigned.map(r => r.getLong(0) -> r.getSeq[Float](3).toArray).toMap
    val cell = assigned.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccos = assigned.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    val ids = vecs.keys.toArray.sorted
    val pairs = for {
      i <- ids; j <- ids
      if i < j && cell(i) == cell(j) && cos(i, j) >= 0.4
    } yield (i, j)
    assert(pairs.nonEmpty, "fixture must contain within-cluster near-dups")
    val parent = scala.collection.mutable.Map(ids.map(x => x -> x): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val dropped = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).values.flatMap { ms =>
        val keeper = ms.minBy(m => (ccos(m), m))
        ms.filterNot(_ == keeper)
      }.toSet
    val expect = ids.filterNot(dropped).map(id => (id, cell(id))).toSet
    val got = run("dd11_semantic").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped.nonEmpty)
    assert(got == expect,
      s"survivor sets diverge: missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("dd11 keeps the cluster outlier: every dropped member has a surviving dominator") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val survivors = run("dd11_semantic").collect().map(_.getLong(0)).toSet
    val assigned = graft.api.Similarity.kmeansAssign(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 2)
      .select("vec_id", "cent_id", "ccos").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val droppedIds = assigned.keySet -- survivors
    assert(droppedIds.nonEmpty)
    droppedIds.foreach { d =>
      val (dc, dcos) = assigned(d)
      // some survivor in the same cell is at-least-as-far from the
      // centroid (the SemDeDup keep rule ran in this cell)
      assert(survivors.exists { s =>
        val (sc, scos) = assigned(s)
        sc == dc && (scos < dcos || (scos == dcos && s < d))
      }, s"dropped $d has no dominating survivor in cell $dc")
    }
  }

  test("vec_dot expression matches higher-order-function dot") {
    VectorFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sf0001).limit(50)
    val hofDot = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select(
      abs(VectorFunctions.dot(col("embedding"), col("embedding")) - hofDot).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff == 0.0, s"native vs HOF dot diverged by $diff")
  }
}
