package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** s3 IVF cost/recall characterization — dd5's Dd5Tune held to the
  * same standard: sweeps the probed-cell count at the shipped geometry
  * (16 seed-centroid cells, k = 5, the vec_id < 10 probe set) against
  * the s1 exact-top-k ground truth, printing recall@k, emitted rows,
  * wall-clock, and shuffle bytes per setting — the data behind the
  * nProbe default in SimilarityQueries (see STATUS.md table).
  * Recall@k = |ivf top-k ∩ exact top-k| / |exact top-k| over all
  * queries. Usage: runMain graft.tools.IvfTune [sfDir] */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.SimilarityQueries.{K, NCells, NQueries}
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < NQueries)
    val cents = emb.filter(col("vec_id") < NCells)
    val truth = graft.api.Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", K)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"# s3 IVF nProbe sweep @ $sfDir — cells: $NCells, k: $K, " +
      s"truth rows: ${truth.size}")
    println("| nProbe | rows | recall@k | sec | shuffleWrite |")
    println("|---|---|---|---|---|")
    for (np <- Seq(1, 2, 3, 4, 6, 8)) {
      val q = graft.api.Similarity
        .ivfTopK(emb, queries, cents, "vec_id", "embedding", K, np)
      q.count() // warm
      val (got, snap) = graft.Metrics.track(spark) {
        q.select("q_id", "n_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = if (truth.isEmpty) 1.0
        else got.intersect(truth).size.toDouble / truth.size
      // Locale.ROOT: the f-interpolator formats under the DEFAULT
      // locale and emits comma decimals (or non-ASCII digits) on
      // non-English boxes — the bug class Bench's locale-safe rounding
      // comment exists to avoid
      println(String.format(java.util.Locale.ROOT,
        "| %d | %d | %.3f | %.2f | %d |",
        np, got.size, recall, snap.wallClockSec, snap.shuffleBytesWritten))
    }
    spark.stop()
  }
}
