package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Heap-floor probe for the barrier MODE on the one query whose sf1
  * memory behavior is heap-bound (q32, STATUS r11: its sf1 warm pass
  * OOMs a default 8 GB driver under the default `localCheckpoint`
  * barrier but runs at 20 GB with exponent 0.18). `localCheckpoint`
  * materializes the exploded-fingerprint projection as RAW row blocks;
  * `persist` mode caches through `DataFrame.persist` — Spark's
  * COLUMNAR compressed in-memory format — so the same barrier holds
  * several times fewer bytes. This main measures q32 at sf1 under a
  * chosen `spark.graft.barrier` mode on whatever heap the JVM was
  * given (SPARK_DRIVER_MEM), so the mitigation is a measured fact,
  * not a theory.
  *
  * Usage: SPARK_DRIVER_MEM=8g sbt "runMain graft.tools.BarrierHeapProbe persist"
  */
object BarrierHeapProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("localCheckpoint")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.api.Barrier.ConfKey, mode)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same letter-ciphered 10x fixture as ScaleProbe (reuse if built)
    val sf1Dir = "target/sf1"
    val docsOut = new java.io.File(s"$sf1Dir/documents.parquet")
    if (!docsOut.exists()) {
      val docs = graft.Tables.documents(spark, src)
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      def rot(s: String, r: Int) = s.drop(r % 26) + s.take(r % 26)
      (0 until 10).map { r =>
        docs.select(
          (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          translate(col("text"), lower + upper, rot(lower, r) + rot(upper, r))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ union _)
        .repartition(32).write.mode("overwrite").parquet(docsOut.toString)
      println(s"[heap-probe] built $sf1Dir")
    }

    val heapGb = Runtime.getRuntime.maxMemory() / (1 << 30)
    def pass(dir: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.Registry.queries("q32_substring_overlap")(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[heap-probe] mode=$mode heap=${heapGb}g dir=$dir rows=$n t=$t%.2f s")
      t
    }
    pass(src)      // warm the JIT at sf0.1 first
    pass(sf1Dir)   // cold sf1
    pass(sf1Dir)   // warm sf1 — the pass that OOMs under localCheckpoint@8g
    spark.stop()
  }
}
