package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** s6 PQ-ADC cost/recall characterization — the evidence behind the
  * (PqM, PqKs, PqRerank) defaults in SimilarityQueries, held to
  * IvfTune/Dd5Tune's standard: sweeps the re-rank candidate count (and
  * one coarser/finer codebook geometry) at the shipped query set
  * against the s1 exact-top-k ground truth. Recall@k =
  * |pq top-k ∩ exact top-k| / |exact top-k| over all queries.
  * Usage: runMain graft.tools.PqTune [sfDir] */
object PqTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      // the tuner's whole job is sweeping geometries BELOW the sizing
      // floors to locate the knees — the enforcement (r14) must not
      // veto the sweep that calibrates it
      .config(graft.api.Similarity.RerankSizingConfKey, "off")
      .config(graft.api.Similarity.ProbeSizingConfKey, "off")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.SimilarityQueries.{K, NQueries, PqIters}
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < NQueries)
    val truth = graft.api.Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", K)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    println(s"# s6 PQ sweep @ $sfDir — n: $n, k: $K, truth rows: ${truth.size}")
    println("| M | Ks | rerank | recall@k | sec |")
    println("|---|---|---|---|---|")
    for ((m, ks) <- Seq((8, 16), (8, 64), (16, 16));
         rr <- Seq(10, 20, 50, 100)) {
      val q = graft.api.Similarity
        .pqTopK(emb, queries, "vec_id", "embedding", K, m, ks, PqIters, rr)
      val t0 = System.nanoTime()
      val got = q.select("q_id", "n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = if (truth.isEmpty) 1.0
        else got.intersect(truth).size.toDouble / truth.size
      println(String.format(java.util.Locale.ROOT,
        "| %d | %d | %d | %.3f | %.2f |", m, ks, rr, recall, sec))
    }
    // IVFADC at the shipped s8 geometry: residual quantization should
    // buy back recall at a QUARTER of s6's code budget (8×16 vs 8×64),
    // while the cell probe prunes the scan nProbe/nCells-fold
    import graft.operators.SimilarityQueries.{AdcCells, AdcCoarseIters, AdcKs}
    println("| ivfadc nProbe | rerank | recall@k | sec |")
    println("|---|---|---|---|")
    for ((np, rr) <- Seq((2, 10), (2, 20), (2, 50), (2, 100),
                         (3, 50), (4, 50), (4, 100))) {
      val q = graft.api.Similarity.ivfadcTopK(
        emb, queries, "vec_id", "embedding", K,
        AdcCells, AdcCoarseIters, 8, AdcKs, PqIters, np, rr)
      val t0 = System.nanoTime()
      val got = q.select("q_id", "n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = if (truth.isEmpty) 1.0
        else got.intersect(truth).size.toDouble / truth.size
      println(String.format(java.util.Locale.ROOT,
        "| %d | %d | %.3f | %.2f |", np, rr, recall, sec))
    }
    spark.stop()
  }
}
