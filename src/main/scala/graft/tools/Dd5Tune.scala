package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dd5 multi-probe cost/recall characterization: sweeps the probe
  * count at the shipped geometry (8 tables × 6 planes, threshold 0.4)
  * against the exact all-pairs ground truth, printing recall, pair
  * count, wall-clock, and shuffle bytes per setting — the data behind
  * the probe-count choice in DedupQueries (see STATUS.md table).
  * Probes are capped at `planes` (Hamming-1 neighbors of a 6-bit
  * signature). Usage: runMain graft.tools.Dd5Tune [sfDir] */
object Dd5Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      // the sweep's low-probe legs ARE the collapse regime the r15
      // model-recall guard rejects — warn, don't veto (the probe's
      // job is measuring the floor the guard's arithmetic models)
      .config(graft.api.Similarity.LshSizingConfKey, "warn")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val emb = graft.Tables.embeddings(spark, sfDir)
    import graft.functions.VectorFunctions.{cosinePre, dot, norm}
    val e = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm")).localCheckpoint(true)
    // exact ground truth: all-pairs cosine (tuning scale only — this is
    // the O(n²) pass the LSH exists to avoid)
    val truth = e.alias("a").join(e.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        cosinePre(dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"# dd5 probe sweep @ $sfDir — truth pairs: ${truth.size}")
    println("| probes | pairs | recall | sec | shuffleWrite |")
    println("|---|---|---|---|---|")
    for (p <- Seq(0, 2, 4, 6)) {
      val q = graft.api.Dedup.embeddingPairs(
        emb, "vec_id", "embedding", 8, 6, 0.4, probes = p)
      q.count() // warm
      val (got, snap) = graft.Metrics.track(spark) {
        q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = if (truth.isEmpty) 1.0
        else got.intersect(truth).size.toDouble / truth.size
      println(f"| $p | ${got.size}%d | $recall%.3f | ${snap.wallClockSec}%.2f " +
        f"| ${snap.shuffleBytesWritten}%d |")
    }
    spark.stop()
  }
}
