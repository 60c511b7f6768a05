package graft.tools

import org.apache.spark.sql.SparkSession

/** Byte-counter attribution for the barrier jobs (round-5 observation:
  * dd2/dd3/dd6 task `bytesRead` ~tripled once the barriers landed).
  * Runs the barriered queries under each `spark.graft.barrier` mode and
  * prints task-level vs filesystem-level read bytes side by side: task
  * `inputMetrics.bytesRead` counts every consumer's read of a
  * barrier/cached block AGAIN (BlockRDD/cached reads are input bytes to
  * the reading task), while `fsBytesRead` is the storage-layer truth —
  * so barrier modes inflate the former and leave the latter alone.
  * Usage: runMain graft.tools.BarrierBytes [sfDir] */
object BarrierBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = Seq("dd2_ngram_jaccard", "dd3_minhash_lsh", "dd6_dup_groups")
    val modes = Seq("localCheckpoint", "persist", "checkpoint", "none")
    println(s"# barrier byte attribution @ $sfDir")
    println("| query | mode | sec | taskBytesRead | fsBytesRead | shuffleWrite |")
    println("|---|---|---|---|---|---|")
    for (q <- queries) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, sfDir).count() // warm (plans, codegen) outside the timers
      for (m <- modes) {
        spark.conf.set("spark.graft.barrier", m)
        val (_, snap) = graft.Metrics.track(spark)(fn(spark, sfDir).count())
        println(f"| $q | $m | ${snap.wallClockSec}%.2f | ${snap.bytesRead}%d " +
          f"| ${snap.fsBytesRead}%d | ${snap.shuffleBytesWritten}%d |")
      }
      spark.conf.unset("spark.graft.barrier")
    }
    spark.stop()
  }
}
