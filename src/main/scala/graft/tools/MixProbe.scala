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
    val pqLeg = sys.env.getOrElse("SPARK_GRAFT_MIX_PQ", "1") == "1"
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.api.Similarity
    val off = ScaleProbe.ReplicaOffset

    def leg(kind: String, label: String, reps: Int, dir: String): Unit =
      graft.api.Barrier.scoped {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = emb.count()
        val queries = emb.filter(
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
          val measR = S.rerankForMeasured(emb, "vec_id", "embedding", K)
          val recallMeas = recallOf(
            S.pqTopK(emb, queries, "vec_id", "embedding", K, 8, 64, 2, measR))
          f""","rerank_auto":$autoR,"recall_auto":$recallAuto%.4f,""" +
            f""""rerank_measured":$measR,"recall_measured":$recallMeas%.4f"""
        }
        val routedPart = if (!routedLeg) "" else {
          val rec = recallOf(
            S.annTopK(emb, queries, "vec_id", "embedding", K))
          f""","recall_routed":$rec%.4f"""
        }
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
          pqPart + routedPart + lshPart + "}")
        graft.api.Barrier.release(exactDf)
      }

    for (reps <- repsList; lam <- lambdas)
      leg("mixed", s"m$lam",
        reps, ScaleProbe.ensureMixedFixture(spark, src, reps, lam))
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
