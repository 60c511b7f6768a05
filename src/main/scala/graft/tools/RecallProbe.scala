package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN/near-dup recall at scale. Two probe families, selected by
  * `SPARK_GRAFT_RECALL_FAMILY`:
  *
  * `pq` (default; r12 verdict task #5, r13 verdict tasks #1–2):
  * recall@k for the s6/s7/s8 geometries on the sign-cipher replica
  * fixture ([[ScaleProbe.replicaSigns]] preserves every within-replica
  * cosine EXACTLY) against the s1 exact baseline. Legs per scale:
  * the geometry AS TUNED at sf0.001/0.01 (rerank = 50 — the fixed-R
  * collapse this probe measured in r13: 0.94 → 0.35 at 5 M vectors),
  * the corpus-scaled rerank (the knee), and — new in r14 — the
  * AUTO-SIZED overloads ([[graft.api.Similarity.rerankFor]] /
  * [[graft.api.Similarity.probeFor]]): the path a caller gets with no
  * operating-scale measurement of their own, which the r13 verdict
  * asked to hold recall@5 ≥ 0.9 at sf10. The session downgrades the
  * r14 sizing enforcement to `warn` so the collapse regime stays
  * measurable — the auto legs go through the same arithmetic the
  * enforcement floors are derived from.
  *
  * `lsh` (r13 verdict task #5): the hyperplane-LSH candidate
  * generators (dd5/dd9 `embeddingPairs` geometry, s2 `lshTopK`).
  * Ground truth for the pair verbs is the LIFTED source-corpus exact
  * pair set: within-replica cosines are bit-identical to the source,
  * so every source pair ≥ threshold appears once per replica at known
  * ids. Candidate-generation recall is evaluated PER PAIR — a truth
  * pair is found iff its table signatures collide in ≥1 table
  * (one-shot, or at Hamming-1 in a probed bit p < probes: the exact
  * `embeddingPairs` band condition, multi-probe expansion on one side
  * of a symmetric adjacency) — so the measurement never materializes
  * the quadratic candidate set. The inc-touching subset of the same
  * check IS dd9's generator (identical per-pair condition; the
  * operators differ only in which side ships slim rows). Candidate
  * VOLUME (the cost side) is estimated from the full-corpus bucket
  * histogram: Σ C(c,2) one-shot + Σ cross-bucket products over probed
  * Hamming-1 bucket pairs. s2 recall@k uses the exact baseline like
  * the pq family — at scale the true top-k fills with cross-replica
  * near-noise pairs (max of n·queries ~N(0, 1/√dim) dots grows with
  * n), exactly the hard-neighbor regime a fixed geometry misses.
  *
  * Env: SPARK_GRAFT_SF_DIR (source corpus, default sf0.1),
  * SPARK_GRAFT_SCALE_REPS (comma list, default "10,100" = sf1/sf10),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_RECALL_RERANKS,
  * SPARK_GRAFT_RECALL_PLANES (lsh; default "6" = dd5's committed
  * geometry; the campaign sweeps "6,9,12" to measure the
  * planes-vs-recall collapse and derive the tables knee).
  * Prints one JSON line per (scale, verb, geometry).
  *
  * The fixture caveat, carried honestly from the r12 tables: these
  * embeddings are near-uniform (PQ's hard case — real text embeddings
  * concentrate on a lower-dimensional manifold that quantizes
  * better), so absolute recall here is a FLOOR, and the signal to
  * read is the TREND across decades.
  */
object RecallProbe {

  private val K = 5

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repsList = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10,100")
      .split(",").map(_.trim.toInt).toSeq
    val family = sys.env.getOrElse("SPARK_GRAFT_RECALL_FAMILY", "pq")
    require(Set("pq", "lsh").contains(family),
      s"SPARK_GRAFT_RECALL_FAMILY must be pq|lsh, got '$family'")
    // `signs` (default) = the near-uniform sign-cipher fixture (PQ/IVF's
    // hard case); `cluster` = the manifold-concentrated 8-cluster
    // fixture (ScaleProbe.ensureClusterFixture) — the r14 verdict's
    // task #2: measure, not assert, whether clustered data closes s8's
    // routing gap
    val fixture = sys.env.getOrElse("SPARK_GRAFT_RECALL_FIXTURE", "signs")
    require(Set("signs", "cluster").contains(fixture),
      s"SPARK_GRAFT_RECALL_FIXTURE must be signs|cluster, got '$fixture'")
    // object-store-shuffle leg capped to heap-derived slots (Bench
    // .probeCpus) — the FS campaign's measured ~250 MB/slot peak
    val cpus = graft.Bench.probeCpus
    val spark = graft.Bench.withShuffleEnv(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the probe's job includes measuring the collapse regimes the
      // r14 sizing enforcement exists to reject — warn, don't veto
      .config(graft.api.Similarity.RerankSizingConfKey, "warn")
      .config(graft.api.Similarity.ProbeSizingConfKey, "warn")
      .config(graft.api.Similarity.LshSizingConfKey, "warn")
      // r16: the auto legs MEASURE the clustered-regime collapse the
      // concentration floor exists to reject — warn, don't veto
      .config(graft.api.Similarity.PqConcConfKey, "warn")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[probe] family: $family, fixture: $fixture, cpus: $cpus, " +
      s"shuffle: ${graft.Bench.shuffleMode}")

    if (family == "pq") pqFamily(spark, src, repsList, fixture)
    else lshFamily(spark, src, repsList, fixture)
    spark.stop()
  }

  private def fixtureDirFor(spark: SparkSession, src: String, reps: Int,
      fixture: String): String =
    if (fixture == "cluster") ScaleProbe.ensureClusterFixture(spark, src, reps)
    else ScaleProbe.ensureFixture(spark, src, reps, needEmb = true)

  // ------------------------------------------------------------------
  // pq family: s6/s7/s8 recall@K vs the s1 exact baseline
  // ------------------------------------------------------------------
  private def pqFamily(spark: SparkSession, src: String,
      repsList: Seq[Int], fixture: String): Unit = {
    val S = graft.api.Similarity
    val off = ScaleProbe.ReplicaOffset

    repsList.foreach { reps =>
      val dir = fixtureDirFor(spark, src, reps, fixture)
      graft.api.Barrier.scoped {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val queries = emb.filter(
          col("vec_id") % off < 3 && col("vec_id") / off < 10)
        val nq = queries.count()
        val n = emb.count()
        // exact ground truth, one pass, reused for all verbs
        val exact = topkSets(S.cosineTopK(emb, queries,
          "vec_id", "embedding", K))

        def report(verb: String, rerank: Int, approx: DataFrame): Unit = {
          val got = topkSets(approx)
          val recalls = exact.map { case (q, truth) =>
            got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / K
          }
          val mean = recalls.sum / recalls.size
          println(f"""{"probe":"recall","verb":"$verb","reps":$reps,""" +
            f""""fixture":"$fixture","rerank":$rerank,"n_queries":$nq,""" +
            f""""k":$K,"recall":${mean}%.4f}""")
        }

        // Legs per verb: the geometry AS TUNED at sf0.001/0.01
        // (rerank = 50 — the fixed-R wall this probe exists to expose)
        // and the ∝n knee (rerank = 50 per 50 k vectors = 50·reps).
        val reranks = sys.env.get("SPARK_GRAFT_RECALL_RERANKS")
          .map(_.split(",").map(_.trim.toInt).toSeq)
          .getOrElse(Seq(50, 50 * reps))
        // s7's operating shape: train once, encode the corpus into a
        // persisted-index-shaped frame, answer from the index
        val books = S.pqTrain(emb, "vec_id", "embedding", 8, 64, 2)
        val index = graft.api.Barrier(
          S.pqEncodeIndex(emb, books, "vec_id", "embedding"))
        for (r <- reranks) {
          report("s6_pq_adc", r, S.pqTopK(emb, queries,
            "vec_id", "embedding", K, 8, 64, 2, r))
          report("s7_pq_index", r, S.pqTopKFromIndex(
            index, emb, queries, books, "vec_id", "embedding", K, r))
          // SPARK_GRAFT_RECALL_S8_KS sweeps the residual codebook size
          // (committed geometry: 16) — the knob that decides whether
          // s8's ceiling is probe-limited or quantization-limited
          val s8ks = sys.env.getOrElse("SPARK_GRAFT_RECALL_S8_KS", "16").toInt
          val s8probe = sys.env.getOrElse("SPARK_GRAFT_RECALL_S8_PROBE", "3").toInt
          report(s"s8_ivfadc_ks${s8ks}_p$s8probe", r, S.ivfadcTopK(emb, queries,
            "vec_id", "embedding", K, 8, 2, 8, s8ks, 2, s8probe, r))
        }
        // AUTO-SIZED legs (r14): the overloads that derive rerank from
        // the corpus count and nProbe from the cell count — the r13
        // verdict's gate is the s6/s7 auto path holding ≥ 0.9 at sf10
        if (sys.env.getOrElse("SPARK_GRAFT_RECALL_AUTO", "1") == "1") {
          val autoR = S.rerankFor(n, K)
          report(s"s6_pq_auto", autoR, S.pqTopK(emb, queries,
            "vec_id", "embedding", K, 8, 64, 2))
          report(s"s7_pq_auto", autoR, S.pqTopKFromIndex(
            index, emb, queries, books, "vec_id", "embedding", K))
          val s8ks = sys.env.getOrElse("SPARK_GRAFT_RECALL_S8_KS", "16").toInt
          report(s"s8_ivfadc_auto_p${S.probeFor(8)}", autoR,
            S.ivfadcTopK(emb, queries,
              "vec_id", "embedding", K, 8, 2, 8, s8ks, 2))
          // r15: the MEASURED-concentration budget — on clustered
          // corpora the estimate lands at the cluster population
          // (where the √n curve collapses); on diffuse it floors at
          // the curve, so this leg doubles as a no-regression check
          val measR = S.rerankForMeasured(emb, "vec_id", "embedding", K)
          report("s6_pq_measured", measR, S.pqTopK(emb, queries,
            "vec_id", "embedding", K, 8, 64, 2, measR))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // lsh family: dd5/dd9 candidate-generator recall + volume, s2
  // ------------------------------------------------------------------
  private val DupThreshold = 0.4 // dd5's committed verification bar

  private def lshFamily(spark: SparkSession, src: String,
      repsList: Seq[Int], fixture: String): Unit = {
    import graft.functions.VectorFunctions
    val S = graft.api.Similarity
    val off = ScaleProbe.ReplicaOffset
    VectorFunctions.register(spark)

    // SOURCE-corpus exact pair set ≥ threshold — computed once; the
    // sign cipher lifts it verbatim into every replica. Brute force is
    // fine here: the source is the sf0.1 fixture (5 k vectors).
    val srcEmb = graft.Tables.embeddings(spark, src)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
    val a = srcEmb.select(col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = srcEmb.select(col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val srcPairs = a.join(broadcast(b), col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (VectorFunctions.dot(col("ea"), col("eb")) /
          (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= DupThreshold)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    println(s"[probe] source exact pairs >= $DupThreshold: ${srcPairs.length}")

    val planesList = sys.env.getOrElse("SPARK_GRAFT_RECALL_PLANES", "6")
      .split(",").map(_.trim.toInt).toSeq
    val tables = sys.env.getOrElse("SPARK_GRAFT_RECALL_TABLES", "8").toInt

    repsList.foreach { reps =>
      val dir = fixtureDirFor(spark, src, reps, fixture)
      graft.api.Barrier.scoped {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = emb.count()
        import spark.implicits._
        // lifted truth: one copy of every source pair per replica.
        // The lift holds ONLY under the sign cipher (dot(Sx, Sy) =
        // dot(x, y)); the cluster fixture re-shapes every cosine, so
        // its lsh run measures the s2/s2p legs (exact baseline per
        // fixture) and skips the pair verbs.
        val truth = srcPairs.toSeq.flatMap { case (va, vb) =>
          (0 until reps).map(r => (va + r.toLong * off, vb + r.toLong * off))
        }.toDF("va", "vb")
        val nTruth = truth.count()

        for (planes <- planesList if fixture == "signs") {
          // per-pair band-collision check (the exact embeddingPairs
          // candidate condition; probes = planes, dd5's committed
          // full-multi-probe setting): signatures of truth endpoints
          // only — the quadratic candidate set is never materialized
          val endpoints = truth.select(col("va").as("vec_id"))
            .union(truth.select(col("vb").as("vec_id"))).distinct()
          val sigT = emb.join(broadcast(endpoints), "vec_id")
            .select(col("vec_id"),
              VectorFunctions.lshSignatures(col("embedding"), tables, planes)
                .as("sigs"))
          val sa = sigT.select(col("vec_id").as("va"), col("sigs").as("sa"))
          val sb = sigT.select(col("vec_id").as("vb"), col("sigs").as("sb"))
          val probes = planes // full Hamming-1 multi-probe, dd5's setting
          val xorCol = zip_with(col("sa"), col("sb"),
            (x, y) => x.bitwiseXOR(y))
          val j = truth.join(broadcast(sa), "va").join(broadcast(sb), "vb")
            .select(col("va"), col("vb"), xorCol.as("xs"))
            .select(col("va"), col("vb"),
              // one-shot: any table with equal sigs
              exists(col("xs"), x => x === 0L).as("hit0"),
              // multi-probe: xor is a single bit at position < probes
              exists(col("xs"), x =>
                x === 0L || (x =!= 0L && (x.bitwiseAND(x - 1) === 0L) &&
                  x < lit(1L << probes))).as("hitp"),
              // per-table one-shot collisions (for the tables* knee)
              size(filter(col("xs"), x => x === 0L)).as("n0"),
              size(filter(col("xs"), x =>
                x === 0L || (x.bitwiseAND(x - 1) === 0L) &&
                  x < lit(1L << probes))).as("np"))
          val agg = j.agg(
            avg(col("hit0").cast("double")).as("r0"),
            avg(col("hitp").cast("double")).as("rp"),
            (sum(col("n0")).cast("double") / (nTruth * tables)).as("t0"),
            (sum(col("np")).cast("double") / (nTruth * tables)).as("tp"),
            // coalesce: if no truth pair touches the increment split
            // the avg is NULL and getDouble would NPE (r14 ADVICE)
            coalesce(avg(when(col("va") % 10 === 0 || col("vb") % 10 === 0,
              col("hitp").cast("double"))), lit(0.0)).as("rp_inc")).head
          // candidate-volume estimate from the full-corpus bucket
          // histogram: Σ C(c,2) same-bucket + probed cross-bucket
          // products (the join's output scale — its cost side)
          val buckets = graft.api.Barrier(emb
            .select(posexplode(
              VectorFunctions.lshSignatures(col("embedding"), tables, planes)))
            .groupBy(col("pos").as("tbl"), col("col").as("sig"))
            .agg(count(lit(1)).cast("double").as("c"))
            .select(col("tbl"), col("sig"), col("c")))
          val oneShotVol = buckets
            .agg(coalesce(sum(col("c") * (col("c") - 1.0) / 2.0), lit(0.0)))
            .head.getDouble(0)
          val flips = (0 until probes).map { p =>
            val nb = buckets.select(col("tbl"),
              col("sig").bitwiseXOR(lit(1L << p)).as("sig"),
              col("c").as("cn"))
            buckets.join(nb, Seq("tbl", "sig"))
              .agg(coalesce(sum(col("c") * col("cn")), lit(0.0)))
              .head.getDouble(0)
          }.sum / 2.0
          println(f"""{"probe":"lsh_recall","verb":"dd5_embed_dup",""" +
            f""""reps":$reps,"n":$n,"tables":$tables,"planes":$planes,""" +
            f""""probes":$probes,"n_truth":$nTruth,""" +
            f""""recall_oneshot":${agg.getDouble(0)}%.4f,""" +
            f""""recall_probed":${agg.getDouble(1)}%.4f,""" +
            f""""per_table_oneshot":${agg.getDouble(2)}%.4f,""" +
            f""""per_table_probed":${agg.getDouble(3)}%.4f,""" +
            f""""recall_probed_inc":${agg.getDouble(4)}%.4f,""" +
            f""""cand_volume_est":${oneShotVol + flips}%.4g}""")
        }

        // s2: lshTopK recall@K at the COMMITTED geometry (4 tables ×
        // 12 planes, one-shot) vs the exact baseline — at scale the
        // true top-k fills with cross-replica near-noise neighbors
        val queries = emb.filter(
          col("vec_id") % off < 3 && col("vec_id") / off < 10)
        val exactDf = graft.api.Barrier(S.cosineTopK(emb, queries,
          "vec_id", "embedding", K))
        val exact = topkSets(exactDf)
        // median true kth-NN cosine — the similarity level the radius
        // legs' MODEL predictions are evaluated at
        val medKth = exactDf.groupBy("q_id").agg(min("cos").as("kc"))
          .agg(expr("percentile(kc, 0.5)")).head.getDouble(0)
        val s2 = topkSets(S.lshTopK(emb, queries, "vec_id", "embedding", K,
          graft.functions.SimConstants.NTables,
          graft.functions.SimConstants.NPlanes))
        val recalls = exact.map { case (q, t) =>
          s2.getOrElse(q, Set.empty).intersect(t).size.toDouble / K
        }
        println(f"""{"probe":"lsh_recall","verb":"s2_ann_lsh","reps":$reps,""" +
          f""""fixture":"$fixture",""" +
          f""""n":$n,"tables":${graft.functions.SimConstants.NTables},""" +
          f""""planes":${graft.functions.SimConstants.NPlanes},""" +
          f""""n_queries":${exact.size},"k":$K,""" +
          f""""recall":${recalls.sum / recalls.size}%.4f}""")
        // s2p: the multi-probe variant (query side also visits every
        // Hamming-1 bucket) — the r14 fix for the one-shot floor
        val s2p = topkSets(S.lshTopK(emb, queries, "vec_id", "embedding", K,
          graft.functions.SimConstants.NTables,
          graft.functions.SimConstants.NPlanes,
          probes = graft.functions.SimConstants.NPlanes))
        val recallsP = exact.map { case (q, t) =>
          s2p.getOrElse(q, Set.empty).intersect(t).size.toDouble / K
        }
        println(f"""{"probe":"lsh_recall","verb":"s2p_ann_lsh_probed",""" +
          f""""reps":$reps,"fixture":"$fixture","n":$n,""" +
          f""""n_queries":${exact.size},"k":$K,""" +
          f""""recall":${recallsP.sum / recallsP.size}%.4f}""")
        // r16 (verdict task #4): the probe-RADIUS axis — Hamming-2/3
        // perturbation sets [Lv et al. 2007] at the SAME committed
        // geometry, model-vs-measured per decade. The model is
        // evaluated at this decade's median true-kth-NN cosine; the
        // candidate-volume estimate (tables·buckets·n/2^planes per
        // query) is the cost side that decides whether a lift is a
        // scale path or a measured dead end.
        val radii = sys.env.getOrElse("SPARK_GRAFT_RECALL_RADII", "")
          .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
        radii.foreach { r =>
          val tabs = graft.functions.SimConstants.NTables
          val pls = graft.functions.SimConstants.NPlanes
          val sr = topkSets(S.lshTopK(emb, queries, "vec_id", "embedding",
            K, tabs, pls, pls, r))
          val rec = exact.map { case (q, t) =>
            sr.getOrElse(q, Set.empty).intersect(t).size.toDouble / K
          }
          val model = 1.0 - math.pow(
            1.0 - S.lshPerTableRate(medKth, pls, pls, r), tabs)
          val bucketsPerQT = (0 to r)
            .map(j => (0 until j).map(i => (pls - i).toDouble / (i + 1))
              .product).sum
          val candPerQuery =
            tabs * bucketsPerQT * n.toDouble / math.pow(2.0, pls)
          println(f"""{"probe":"lsh_recall","verb":"s2r_ann_lsh_radius",""" +
            f""""reps":$reps,"fixture":"$fixture","n":$n,"radius":$r,""" +
            f""""n_queries":${exact.size},"k":$K,"med_kth_cos":$medKth%.4f,""" +
            f""""recall":${rec.sum / rec.size}%.4f,""" +
            f""""model_recall":$model%.4f,""" +
            f""""cand_per_query":$candPerQuery%.4g}""")
        }
        graft.api.Barrier.release(exactDf)
      }
    }
  }

  /** q_id → set of returned neighbor ids. */
  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
}
