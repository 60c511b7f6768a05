package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the CONCENTRATION MIDDLE (r16 verdict task #6) and the
  * AUTO-CHOSEN radius geometry (task #5's model-vs-measured row) in
  * one campaign, over two fixture families:
  *
  * MIXED legs ([[ScaleProbe.ensureMixedFixture]], λ ∈ {25, 50, 75}%
  * clustered over the diffuse sign-cipher base): the corpora the
  * floor's unmeasured middle was ASSUMED to hold. First run's verdict
  * (r17, target/r17_mix_probe.log): mixtures do NOT land in the
  * middle on the 10th-percentile axis — the stat stays 0.275–0.296
  * (the diffuse band, below the 0.6 floor) at every λ while the √n
  * auto budget COLLAPSES at scale (recall@5 0.58 / 0.47 at λ =
  * 0.5 / 0.75, 200 k vectors) and the measured remedy holds 0.99.
  * That refutation was operationalized the same round: the floor and
  * router now trip on the concentrated-query FRACTION
  * ([[graft.api.Similarity.annConcentratedFraction]]), which this
  * probe prints (`conc_frac`) beside the percentile, plus the ROUTED
  * verb's own recall (`recall_routed` — annTopK end-to-end, which on
  * these shapes must take the measured-rerank path).
  *
  * SPREAD legs ([[ScaleProbe.ensureSpreadFixture]], noise 0.8):
  * uniformly mid-concentrated corpora (10th-pct stat ≈ 0.55–0.65)
  * where the r17 radius LADDER escalates — the auto-chosen
  * (tables, planes, probes, radius) geometry is exercised end-to-end
  * and its measured recall printed beside the closed-form model at
  * the leg's median true-kth-NN cosine, with cand/query (the task #5
  * "model-vs-measured at the auto-chosen geometry" row, two decades).
  *
  * Guards run in `warn` mode: this probe's job is measuring the
  * regimes the enforcement exists to reject.
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default sf0.1),
  * SPARK_GRAFT_SCALE_REPS (default "10,100" — 20 k / 200 k vectors),
  * SPARK_GRAFT_MIX_LAMBDAS (default "25,50,75"; "" skips mixed legs),
  * SPARK_GRAFT_MIX_SPREAD (spread-leg reps list, default "" = skip;
  * the r17 campaign ran "10,100,1000"),
  * SPARK_GRAFT_MIX_SYNTH (comma list of SYNTHETIC row counts — r20:
  * [[ScaleProbe.ensureSynthMixedFixture]] legs at arbitrary n, the
  * embedding family's analogue of the hamming 20 M synthetic-sig
  * point; default "" = skip; SPARK_GRAFT_MIX_SYNTH_DIM, default 64),
  * SPARK_GRAFT_MIX_ROUTED=0 skips the routed-verb recall leg,
  * SPARK_GRAFT_MIX_PQ=0 the auto/measured PQ legs (each trains +
  * encodes the full corpus — the long pole at the 2 M decade, where
  * the row of interest is the auto-chosen radius geometry).
  */
object MixProbe {

  private val K = 5

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repsList = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10,100")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val lambdas = sys.env.getOrElse("SPARK_GRAFT_MIX_LAMBDAS", "25,50,75")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val spreadReps = sys.env.getOrElse("SPARK_GRAFT_MIX_SPREAD", "")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val routedLeg = sys.env.getOrElse("SPARK_GRAFT_MIX_ROUTED", "1") == "1"
    // SPARK_GRAFT_MIX_PQ=0 skips the auto/measured PQ recall legs —
    // each trains + encodes the full corpus, the campaign's long pole
    // at the 2 M decade, where the leg of interest is the ROUTER's
    // auto-chosen LSH geometry (radius ladder) and its measured recall
    // "1" = auto + measured PQ legs, "auto" = the auto (√n-budget) leg
    // only — half the train+encode cost, the leg that locates the
    // collapse point at the 2 M decade — "0" = none
    val pqMode = sys.env.getOrElse("SPARK_GRAFT_MIX_PQ", "1")
    val pqLeg = pqMode == "1" || pqMode == "auto"
    // SPARK_GRAFT_MIX_DD9=1 adds the r18 ASYMMETRIC-LADDER leg on the
    // spread fixtures: a 150-row increment probes a corpus signature
    // asset built at the route's auto geometry, at the radius
    // lshIncRadiusFor derives vs the radius-1 baseline — pair recall
    // against the exact inc-touching truth (brute-forced via one
    // broadcast nested-loop pass; the increment is query-shaped small)
    val dd9Leg = sys.env.getOrElse("SPARK_GRAFT_MIX_DD9", "0") == "1"
    val cpus = graft.Bench.probeCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-mix-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.api.Similarity.RerankSizingConfKey, "warn")
      .config(graft.api.Similarity.ProbeSizingConfKey, "warn")
      .config(graft.api.Similarity.LshSizingConfKey, "warn")
      .config(graft.api.Similarity.PqConcConfKey, "warn")
      .config(graft.api.Dedup.CandBudgetConfKey, "warn")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.api.Similarity
    val off = ScaleProbe.ReplicaOffset

    def leg(kind: String, label: String, reps: Int, dir: String,
        synth: Boolean = false): Unit =
      graft.api.Barrier.scoped {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = emb.count()
        // replica fixtures: 10 base ids x 3 sign replicas; synthetic
        // fixtures have no replica structure — every (n/30)th id, so
        // the 30 queries spread across the id space and mix
        // clustered/diffuse rows by the same id-hash rule as the corpus
        val queries =
          if (synth) emb.filter(pmod(col("vec_id"),
            lit(math.max(1L, n / 30L))) === 0 && col("vec_id") < n / 30L * 30L)
          else emb.filter(
            col("vec_id") % off < 3 && col("vec_id") / off < 10)
        val exactDf = graft.api.Barrier(
          S.cosineTopK(emb, queries, "vec_id", "embedding", K))
        val exact = topkSets(exactDf)
        val medKth = exactDf.groupBy("q_id").agg(min("cos").as("kc"))
          .agg(expr("percentile(kc, 0.5)")).head.getDouble(0)
        def recallOf(df: DataFrame): Double = {
          val got = topkSets(df)
          val rs = exact.map { case (q, t) =>
            got.getOrElse(q, Set.empty).intersect(t).size.toDouble / K }
          rs.sum / rs.size
        }

        val route = S.annRoute(emb, "vec_id", "embedding", K)
        val pqPart = if (!pqLeg) "" else {
          val autoR = S.rerankFor(n, K)
          val recallAuto = recallOf(
            S.pqTopK(emb, queries, "vec_id", "embedding", K, 8, 64, 2))
          val autoPart =
            f""","rerank_auto":$autoR,"recall_auto":$recallAuto%.4f"""
          if (pqMode == "auto") autoPart else {
            val measR = S.rerankForMeasured(emb, "vec_id", "embedding", K)
            val recallMeas = recallOf(
              S.pqTopK(emb, queries, "vec_id", "embedding", K, 8, 64, 2, measR))
            autoPart + f""","rerank_measured":$measR,""" +
              f""""recall_measured":$recallMeas%.4f"""
          }
        }
        val routedPart = if (!routedLeg) "" else {
          val rec = recallOf(
            S.annTopK(emb, queries, "vec_id", "embedding", K))
          f""","recall_routed":$rec%.4f"""
        }
        val dd9Part = (if (dd9Leg) route.geometry else None).map { g =>
          import graft.functions.VectorFunctions
          VectorFunctions.register(spark)
          val D = graft.api.Dedup
          val thr = route.stat // the level the route's geometry is derived at
          val isInc = col("vec_id") % off < 5 && col("vec_id") / off < 30
          val incRows = emb.filter(isInc)
          // exact inc-touching truth: one broadcast pass, 150 x n cos
          val aT = incRows.select(col("vec_id").as("va"),
            col("embedding").as("ea"),
            VectorFunctions.norm(col("embedding")).as("na"))
          val bT = emb.select(col("vec_id").as("vb"),
            col("embedding").as("eb"),
            VectorFunctions.norm(col("embedding")).as("nb"))
          // truth stays DISTRIBUTED (at 2 M the inc-touching pair set
          // is millions of rows — collecting it OOMed the first run);
          // recall is a semi-join count, never a driver-side set
          val truthDf = graft.api.Barrier(
            bT.join(broadcast(aT), col("va") =!= col("vb"))
              .filter(VectorFunctions.dot(col("ea"), col("eb")) /
                (col("na") * col("nb")) >= thr)
              .select(least(col("va"), col("vb")).as("pa"),
                greatest(col("va"), col("vb")).as("pb"))
              .distinct())
          val nTruth = truthDf.count()
          // the persisted-asset shape: corpus sigs at the route's
          // (tables, planes); only the increment probes
          val corpusSigs = graft.api.Barrier(D.lshSignatureTable(
            emb.filter(!isInc), "vec_id", "embedding", g.tables, g.planes))
          val incSigs = D.lshSignatureTable(
            incRows, "vec_id", "embedding", g.tables, g.planes)
          val autoRadius = graft.api.Similarity.lshIncRadiusFor(
            g.tables, g.planes, g.planes, thr, spark)
          def pairRecall(radius: Int): Double = {
            val found = D.incrementalEmbeddingPairs(corpusSigs, incSigs,
                thr, probes = g.planes, radius = radius)
              .select(col("vec_a").as("pa"), col("vec_b").as("pb"))
            val hit = truthDf.join(found, Seq("pa", "pb"), "left_semi")
              .count()
            hit.toDouble / math.max(1L, nTruth)
          }
          val rAuto = pairRecall(autoRadius)
          val r1 = if (autoRadius == 1) rAuto else pairRecall(1)
          val frac = graft.api.Similarity.lshCandFraction(
            graft.api.Similarity.LshGeometry(g.tables, g.planes, g.planes,
              autoRadius))
          graft.api.Barrier.release(corpusSigs)
          graft.api.Barrier.release(truthDf)
          f""","dd9_threshold":$thr%.4f,"dd9_truth":$nTruth,""" +
            f""""dd9_radius":$autoRadius,"dd9_recall":$rAuto%.4f,""" +
            f""""dd9_recall_r1":$r1%.4f,"dd9_cand_frac":$frac%.4g"""
        }.getOrElse("")
        val lshPart = route.geometry.map { g =>
          val rec = recallOf(S.lshTopK(emb, queries, "vec_id", "embedding",
            K, g.tables, g.planes, g.probes, g.radius))
          val model = 1.0 - math.pow(
            1.0 - S.lshPerTableRate(medKth, g.planes, g.probes, g.radius),
            g.tables)
          val candPerQuery = S.lshCandFraction(g) * n
          f""","route_tables":${g.tables},"route_planes":${g.planes},""" +
            f""""route_probes":${g.probes},"route_radius":${g.radius},""" +
            f""""recall_lsh_routed":$rec%.4f,"model_recall":$model%.4f,""" +
            f""""cand_per_query":$candPerQuery%.4g"""
        }.getOrElse("")
        println(f"""{"probe":"mix","kind":"$kind","label":"$label",""" +
          f""""reps":$reps,"n":$n,"stat":${route.stat}%.4f,""" +
          f""""conc_frac":${route.concFrac}%.4f,""" +
          f""""family":"${route.family}","med_kth_cos":$medKth%.4f""" +
          pqPart + routedPart + lshPart + dd9Part + "}")
        graft.api.Barrier.release(exactDf)
      }

    for (reps <- repsList; lam <- lambdas)
      leg("mixed", s"m$lam",
        reps, ScaleProbe.ensureMixedFixture(spark, src, reps, lam))
    val synthNs = sys.env.getOrElse("SPARK_GRAFT_MIX_SYNTH", "")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    val synthDim = sys.env.getOrElse("SPARK_GRAFT_MIX_SYNTH_DIM", "64").toInt
    for (sn <- synthNs; lam <- lambdas)
      leg("synth", s"m$lam", (sn / 2000L).toInt,
        ScaleProbe.ensureSynthMixedFixture(spark, sn, synthDim, lam),
        synth = true)
    for (reps <- spreadReps)
      leg("spread", "s80",
        reps, ScaleProbe.ensureSpreadFixture(spark, src, reps, 80))
    spark.stop()
  }

  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
}
