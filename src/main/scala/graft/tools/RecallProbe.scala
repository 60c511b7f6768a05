package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall at scale (r12 verdict task #5): PqTune's recall knees
  * (s6 0.90–0.94, s8 0.88) were measured at sf0.001/sf0.01 only; this
  * probe measures recall@k for the s6/s7/s8 geometries at sf1/sf10
  * (the sign-cipher replica fixture — [[ScaleProbe.replicaSigns]]
  * preserves every within-replica cosine EXACTLY, so the neighbor
  * structure is the source corpus's, replicated) against the s1 exact
  * baseline. The question it answers: does recall under the FIXED
  * committed geometry (m=8, ks=64 codes, rerank=50; s8: 8 coarse
  * cells, probe 3) degrade as the corpus grows past the tuning scale?
  *
  * Queries: the first 3 vectors of each of the first 10 replicas
  * (30 queries — more than the fixture queries' 10, and spread across
  * replicas so cross-replica routing is exercised), k = 5. Recall@5 =
  * |approx ∩ exact| / 5 averaged over queries; exact side =
  * [[graft.api.Similarity.cosineTopK]] (n·queries dots — fine at 5 M).
  *
  * Env: SPARK_GRAFT_SF_DIR (source corpus, default sf0.1),
  * SPARK_GRAFT_SCALE_REPS (comma list, default "10,100" = sf1/sf10),
  * SPARK_GRAFT_CPUS. Prints one JSON line per (scale, verb).
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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.api.Similarity
    val off = ScaleProbe.ReplicaOffset

    repsList.foreach { reps =>
      val dir = ScaleProbe.ensureFixture(spark, src, reps, needEmb = true)
      graft.api.Barrier.scoped {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val queries = emb.filter(
          col("vec_id") % off < 3 && col("vec_id") / off < 10)
        val nq = queries.count()
        // exact ground truth, one pass, reused for all three verbs
        val exact = topkSets(S.cosineTopK(emb, queries,
          "vec_id", "embedding", K))

        def report(verb: String, rerank: Int, approx: DataFrame): Unit = {
          val got = topkSets(approx)
          val recalls = exact.map { case (q, truth) =>
            got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / K
          }
          val mean = recalls.sum / recalls.size
          println(f"""{"probe":"recall","verb":"$verb","reps":$reps,""" +
            f""""rerank":$rerank,"n_queries":$nq,"k":$K,""" +
            f""""recall":${mean}%.4f}""")
        }

        // Two points per verb: the geometry AS TUNED at sf0.001/0.01
        // (rerank = 50 — the fixed-R wall this probe exists to expose:
        // on near-uniform vectors the count of corpus points whose ADC
        // noise exceeds the true kth-neighbor gap grows ~linearly in
        // n, so a fixed candidate budget must drown) and the ∝n knee
        // (rerank = 50 per 50 k vectors, i.e. 50·reps on this fixture).
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
      }
    }
    spark.stop()
  }

  /** q_id → set of returned neighbor ids. */
  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
}
