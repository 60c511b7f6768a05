package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrate the r15 `jaccardPairs` pair-budget guard AT the
  * measured wall, in the harness — the r14 template (its mm-probe
  * twin is target/r14_mm_guard.log): build a duplicate-HEAPED text
  * corpus the cipher fixtures deliberately avoid, show the all-pairs
  * verb failing LOUD in seconds with the exact Σ C(c,2) estimate and
  * the contraction remedy in the message, then run the recommended
  * verb (`jaccardGroups`) to completion ON THE SAME CORPUS under the
  * SAME default budget.
  *
  * The heap corpus: every sf0.01 document replicated `copies`× with
  * fresh ids and IDENTICAL text — the re-crawl/boilerplate shape.
  * Identical texts ⇒ identical minhash signatures ⇒ every band
  * collides and every pair survives verification at jac = 1.0, so at
  * the default 500 docs × 1000 copies the guaranteed output is
  * 500·C(1000,2) ≈ 2.5×10⁸ pairs (> the 1e8 default budget) from a
  * 500 k-doc corpus — the exact regime the r13 probe measured OOM'ing
  * mm8's all-pairs form after minutes of work.
  *
  * Since r16 `SPARK_GRAFT_HEAP_COPIES` is a comma LIST (default
  * "100,1000" — 50 k and 500 k docs): `jaccardGroups` is timed (min
  * of `SPARK_GRAFT_HEAP_PASSES`, default 2) at EVERY decade and the
  * adjacent-decade scaling exponent is printed — the remedy verb's
  * heap-shape scaling row the r15 verdict asked for (the replica
  * fixture's dd12 ScaleProbe row covers the diffuse shape; THIS is
  * the shape the guard actually diverts to the verb). The guard-trip
  * leg runs at decades whose guaranteed output exceeds the budget.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_HEAP_COPIES,
  * SPARK_GRAFT_HEAP_PASSES. Prints one JSON line per (decade, leg).
  */
object TextHeapProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val copiesList = sys.env.getOrElse("SPARK_GRAFT_HEAP_COPIES", "100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_HEAP_PASSES", "2").toInt
    val cpus = graft.Bench.probeCpus
    val spark = graft.Bench.withShuffleEnv(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-text-heap-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, src).select("doc_id", "text")
    val nSrc = docs.count()
    val budget = graft.api.Dedup.PairBudgetDefault
    val off = ScaleProbe.ReplicaOffset

    val groupsSecs = copiesList.map { copies =>
      // fresh ids per replica, text VERBATIM (no cipher) — the heap
      val heaped = (0 until copies).map { r =>
        docs.select((col("doc_id") + lit(r.toLong * off)).as("doc_id"),
          col("text"))
      }.reduce(_ union _)
      val guaranteed = nSrc * copies.toLong * (copies - 1) / 2
      println(s"[probe] heap corpus: $nSrc distinct texts x $copies copies " +
        s"= ${nSrc * copies} docs; guaranteed pairs = " +
        f"$guaranteed%.3g (budget $budget)")

      // Leg 1 (tripping decades only): the all-pairs verb fails LOUD
      if (guaranteed > budget) {
        val t0 = System.nanoTime()
        val msg = try {
          graft.api.Dedup.jaccardPairs(heaped, "doc_id", "text", 8, 4, 0.8)
          "NO-THROW (unexpected)"
        } catch { case e: IllegalArgumentException => e.getMessage }
        val tGuard = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"text_heap","leg":"jaccardPairs_guard",""" +
          f""""docs":${nSrc * copies},"sec":$tGuard%.2f,""" +
          s""""thrown":${msg != "NO-THROW (unexpected)"},""" +
          s""""names_remedy":${msg.contains("jaccardGroups")}}""")
        println(s"[probe] guard message: $msg")
      }

      // Leg 2: the recommended contraction verb completes ON THE SAME
      // CORPUS under the SAME default budget (its inner band join sees
      // one representative per distinct text); min over warm passes
      val runs = (1 to passes).map { _ =>
        val t1 = System.nanoTime()
        val nGroups = graft.api.Barrier.scoped {
          graft.api.Dedup.jaccardGroups(heaped, "doc_id", "text", 8, 4, 0.8)
            .count()
        }
        ((System.nanoTime() - t1) / 1e9, nGroups)
      }
      val best = runs.minBy(_._1)
      println(f"""{"probe":"text_heap","leg":"jaccardGroups",""" +
        f""""docs":${nSrc * copies},"copies":$copies,"sec":${best._1}%.2f,""" +
        f""""passes":${runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")},""" +
        s""""member_rows":${best._2}}""")
      (copies, best._1)
    }
    groupsSecs.sliding(2).foreach {
      case Seq((c1, t1), (c2, t2)) if t1 > 0 =>
        val exp = math.log(t2 / t1) / math.log(c2.toDouble / c1)
        println(f"""{"probe":"text_heap","leg":"jaccardGroups_exponent",""" +
          f""""from":${c1},"to":${c2},"exponent":$exp%.2f}""")
      case _ => ()
    }
    spark.stop()
  }
}
