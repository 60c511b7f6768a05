package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured row for the r18 verdict's item #4 (the Hamming family's
  * ladder): at the daily-increment shape — corpus signature asset of
  * `n` 64-bit sigs, 10 k-row increment — time
  * [[graft.api.Dedup.incrementalHammingPairs]] at maxHamming 3
  * (exact-piece probing, the pre-r19 wall) vs 5 and 7 (one-bit piece
  * probing, 17× the increment's slim piece rows), and MEASURE the
  * completeness the pigeonhole argument proves: the increment is
  * planted at exact distances 0..8 from corpus rows, so recall over
  * the ≤ maxHamming planted band must read 1.0000 at every rung —
  * unlike dd9's model-recall ladder there is nothing probabilistic to
  * tune, which is exactly the r19 finding (no dd9-style hole at ≤ 3;
  * the gap was the hard wall at 3, and the rung to 7 costs 17× probe
  * rows on the increment side only, the corpus asset untouched).
  *
  * Fixture: corpus sigs = xxhash64(id) (uniform — accidental ≤ 7
  * collisions are ~C(64,≤7)/2⁶⁴ ≈ 3·10⁻¹⁰ per pair); increment row i
  * = corpus row i's sig with (i mod 9) distinct bits flipped at
  * positions (i + 9j) mod 64. Planted pairs with d > maxHamming must
  * NOT appear (precision leg).
  *
  * Env: SPARK_GRAFT_HAM_N (corpus rows, default 2000000),
  * SPARK_GRAFT_HAM_INC (increment rows, default 10000),
  * SPARK_GRAFT_HAM_LEVELS (default "3,5,7"),
  * SPARK_GRAFT_HAM_PASSES (default 2; reported wall is the min).
  */
object HammingLadderProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_HAM_N", "2000000").toLong
    val nInc = sys.env.getOrElse("SPARK_GRAFT_HAM_INC", "10000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_HAM_LEVELS", "3,5,7")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_HAM_PASSES", "2").toInt
    val cpus = graft.Bench.probeCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-hamming-ladder-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = graft.api.Dedup

    graft.api.Barrier.scoped {
      val corpus = graft.api.Barrier(spark.range(n)
        .select(col("id").as("doc_id"), xxhash64(col("id")).as("sig")))
      // increment: row i = corpus sig i with (i % 9) bits flipped at
      // positions (i + 9j) % 64, j < d — distinct positions (9j runs
      // 0..72 step 9, distinct mod 64 for j < 8)
      val mask = (0 until 8).map { j =>
        when(pmod(col("doc_id"), lit(9L)) > j,
          expr(s"shiftleft(cast(1 as bigint), " +
            s"cast(pmod(doc_id + ${9 * j}, 64) as int))"))
          .otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseXOR(b))
      val inc = graft.api.Barrier(corpus.filter(col("doc_id") < nInc)
        .select((col("doc_id") + n).as("doc_id"),
          col("sig").bitwiseXOR(mask).as("sig")))
      println(s"[hamladder] corpus=${corpus.count()} inc=${inc.count()}")
      // planted truth per distance band: i % 9 = d (d = 0 is an exact
      // duplicate; 8 is out of every rung's reach)
      def plantedUpTo(h: Int): Long = (0L until nInc).count(_ % 9 <= h)

      for (maxH <- levels) {
        val times = (1 to passes).map { p =>
          val t0 = System.nanoTime()
          val found = D.incrementalHammingPairs(
            corpus, inc, "doc_id", "sig", maxH)
          // planted recall/precision, distributed: a planted pair is
          // (i, i + n); join found pairs against the planted key
          val planted = found
            .filter(col("doc_b") === col("doc_a") + n).count()
          val total = found.count()
          val sec = (System.nanoTime() - t0) / 1e9
          (sec, planted, total)
        }
        val (sec, planted, total) = times.minBy(_._1)
        val want = plantedUpTo(maxH)
        val probeRows = nInc * 4 * (if (maxH <= 3) 1 else 17)
        println(f"[hamladder] maxH=$maxH wall=$sec%.2f s planted_found=" +
          s"$planted/$want (recall=${if (want == 0) 1.0 else planted.toDouble / want}) " +
          s"total_pairs=$total probe_rows=$probeRows")
        require(planted == want,
          s"completeness broken at maxH=$maxH: $planted != $want")
        require(total >= planted, "found set smaller than planted subset")
      }
      graft.api.Barrier.release(inc)
      graft.api.Barrier.release(corpus)
    }
    spark.stop()
  }
}
