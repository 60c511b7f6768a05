package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (SparkEntry.benchQueries)
  * on SPARK_GRAFT_SF_DIR in one session, printing the driver-contract
  * JSON line.
  *
  * Methodology: a warm pass first runs every bench query once at
  * sf0.001 (tiny — the whole pass is a few seconds), so the timed pass
  * measures engine throughput at the target SF rather than first-call
  * Catalyst planning + whole-stage/encoder codegen + JIT, which are
  * per-process one-offs that don't scale with data. The timed pass
  * wraps each query in Metrics.track, so the JSON line also carries
  * per-query bytesRead / shuffleWrite (reference F22 parity,
  * `/root/reference/driver.go:246-249`'s per-job byte log lines).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // accurate byte accounting: vectored parquet IO bypasses both
      // task input metrics and FileSystem statistics (see Metrics)
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.benchQueries.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () } // a warm-pass failure surfaces in the timed pass
    }

    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      try {
        val (_, snap) = Metrics.track(spark)(fn(spark, sfDir).count())
        (name, snap.wallClockSec,
          math.max(snap.bytesRead, snap.fsBytesRead), snap.shuffleBytesWritten)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        // failed queries are marked -1.0 instead of masquerading as timings
        (name, -1.0, 0L, 0L)
      }
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val bytes = results
      .map { case (k, _, r, s) => s""""$k":{"bytesRead":$r,"shuffleWrite":$s}""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, _) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"bytes":$bytes,"warmup":"full-pass@sf0.001","sf":"$sfDir"}""")
    spark.stop()
  }
}
