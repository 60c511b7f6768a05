package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the r16 histogram-backed incremental guard against the r15
  * full-aggregate one across corpus decades — the verdict's "done"
  * criterion for its top task: the precheck's cost must stop scaling
  * with corpus size once the `_pairhist` sidecar exists.
  *
  * Fixture: synthetic minhash-signature ASSETS (the dd7 daily shape —
  * (doc_id, hs, nh, bkeys) parquet, bkeys being the guard key) at
  * `SPARK_GRAFT_GUARD_DECADES` row counts (default 1e5,1e6,1e7), with
  * 0.1% of rows collapsed into one duplicate heap (ΣC(c,2) stays under
  * the default budget — this probe times the PASSING precheck, the
  * tripping one is TextHeapProbe's job) and a fixed 1000-row
  * increment. The timed region is exactly what a daily dd7 call pays
  * BEFORE its join: [read sidecar +] verb invocation — the pair
  * generators run their budget precheck eagerly at call time and
  * return a lazy frame, so wall-clock of the CALL is the precheck.
  *
  * Expected shape: the full-aggregate leg grows ~linearly with the
  * corpus (it re-scans the asset's key column per call); the
  * histogram leg is flat (Θ(increment + sidecar), the sidecar holding
  * one row per c ≥ 2 key — here exactly 1).
  *
  * Prints one JSON line per (decade, leg); passes = min over
  * `SPARK_GRAFT_GUARD_PASSES` (default 3) calls.
  */
object GuardCostProbe {
  def main(args: Array[String]): Unit = {
    val decades = sys.env.getOrElse("SPARK_GRAFT_GUARD_DECADES",
      "100000,1000000,10000000").split(",").map(_.trim.toLong).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_GUARD_PASSES", "3").toInt
    val cpus = graft.Bench.probeCpus
    val spark = graft.Bench.withShuffleEnv(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-guard-cost-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // truthful byte accounting (Bench's contract): vectored parquet
      // IO bypasses task input metrics and FileSystem statistics
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the verbs' verification tail resolves the native kernels at plan
    // construction; real pipelines register through shingled()
    graft.functions.HashFunctions.register(spark)

    val root = "target/graft_guardcost"
    def sigs(ids: DataFrame): DataFrame = {
      // one heap key per 1000 ids; everything else distinct — bkeys is
      // an 8-long array like a real (bands=8) asset's
      val base = when(col("id") % 1000 === 0, lit(0L)).otherwise(col("id"))
      ids.select(col("id").as("doc_id"),
        array(col("id") % 7919, col("id") % 104729 + 104729).as("hs"),
        lit(2).as("nh"),
        array((0 until 8).map(b => base * 31 + b): _*).as("bkeys"))
    }

    decades.foreach { n =>
      val dir = s"$root/asset_$n"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base/_SUCCESS"))) {
        sigs(spark.range(n).toDF("id"))
          .write.mode("overwrite").parquet(s"$dir/base")
        graft.api.Dedup.writeSignatureHistogram(
          spark, s"$dir/base", graft.api.Dedup.jaccardGuardKeys)
      }
      val corpus = spark.read.parquet(s"$dir/base")
      // 1000 new docs, one landing in the heap (cc·ci work, no trip)
      val inc = graft.api.Barrier(sigs(
        spark.range(1000).toDF("id")
          .select((col("id") * 1000 + 500000000L).as("id"))
        ).union(sigs(spark.range(1).toDF("id"))
          .withColumn("doc_id", lit(600000000L))))
      inc.count() // materialize: the probe times the guard, not the inc

      def timeLeg(leg: String, call: () => Unit): Unit = {
        val runs = (1 to passes).map { _ =>
          val (_, snap) = graft.Metrics.track(spark)(call())
          (snap.wallClockSec, math.max(snap.bytesRead, snap.fsBytesRead))
        }
        val best = runs.minBy(_._1)
        println(f"""{"probe":"guard_cost","decade":$n,"leg":"$leg",""" +
          f""""sec":${best._1}%.3f,"bytesRead":${best._2},""" +
          f""""passes":${runs.map(r => f"${r._1}%.3f")
            .mkString("[", ",", "]")}}""")
      }
      timeLeg("full_aggregate", () =>
        graft.api.Dedup.incrementalJaccardPairs(corpus, inc, 0.8))
      timeLeg("histogram", () => {
        val h = graft.api.Dedup.readSignatureHistogram(
          spark, dir, graft.api.Dedup.jaccardGuardKeys)
        require(h.isDefined, "sidecar missing — seeding failed")
        graft.api.Dedup.incrementalJaccardPairs(corpus, inc, 0.8, h)
      })
      graft.api.Barrier.release(inc)
    }
    spark.stop()
  }
}
