package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B measurement for the SALTED two-phase ADC sort-path selection
  * (r18 verdict task #2): at the 2 M mixed-corpus decade the routed
  * measured-rerank remedy crosses the heap ceiling and takes the
  * sort path, whose r18 single-phase `Window.partitionBy(q_id)` ran
  * the whole selection on #queries tasks. This probe pre-builds the
  * PQ index ONCE (train + encode barrier'd out of the timed region —
  * the campaign's long pole), then times `pqTopKFromIndex` at a
  * ceiling-crossing rerank under each salt setting, with a stage
  * listener recording per-stage task counts so the selection stage's
  * width is measured, not asserted.
  *
  * `salts=1` is the single-phase r18 shape (one salt group per query
  * — same task-per-query selection, plus one degenerate slim
  * re-rank); `salts=0` is the derived default
  * (clamp(⌈4·shuffle.partitions / queries⌉, 2, 64) — the 4×
  * over-partition factor buys group BALANCE, which the 2 M A/B
  * measured as what actually pays, and the 64 cap keeps phase 2's
  * per-query survivor set corpus-size-free; see
  * `Similarity.PqSortSelectSaltsKey`); larger pins exercise the width
  * the conf buys on a wide cluster.
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default sf0.1),
  * SPARK_GRAFT_SORTSEL_REPS (mixed-fixture reps, default 1000 = 2 M
  * vectors), SPARK_GRAFT_SORTSEL_LAMBDA (default 25),
  * SPARK_GRAFT_SORTSEL_RERANK (default 100000 — 30 queries × 1e5 =
  * 3e6 > the 2²¹ ceiling), SPARK_GRAFT_SORTSEL_SALTS (comma list,
  * default "1,0,8"), SPARK_GRAFT_SORTSEL_PASSES (default 2; the
  * reported number is the min).
  *
  * r20 additions (the phase-2 fold-tree A/B — the r19 verdict's
  * "worth a tree-rank if a future measurement ever shows phase 2 as
  * the pole" measurement): SPARK_GRAFT_SORTSEL_SYNTH=<n> reads the
  * ScaleProbe SYNTHETIC mixed fixture at n rows instead of the
  * replica fixture (no source-fixture ceiling — the r20 10 M ANN
  * decade); SPARK_GRAFT_SORTSEL_NQ (default 30) bounds the id-spread
  * query set so the small-batch regime (nq ≪ cores — where phase 2's
  * per-query task cannot fill the machine) is measurable;
  * SPARK_GRAFT_SORTSEL_FOLD (comma list, default "" = leave the conf
  * at its default) pins `spark.graft.pq.sortselect.fold` per leg —
  * a value ≥ the salt count reproduces the r19 single-level phase 2;
  * SPARK_GRAFT_SORTSEL_HEAPMAX pins `spark.graft.pq.heapselect.max`
  * so the sort path engages at small-nq products (nq=4 × 1e5 sits
  * under the default 2²¹ ceiling; raising rerank past the per-salt
  * group size instead would degenerate phase 1 to keep-everything).
  * Each leg's stage log now carries summed executorRunTime per stage
  * so the phase-2 share is attributed, not inferred.
  */
object SortSelProbe {
  private val K = 5

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_REPS", "1000").toInt
    val lam = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_LAMBDA", "25").toInt
    val rerank = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_RERANK", "100000").toInt
    val saltsList = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_SALTS", "1,0,8")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_PASSES", "2").toInt
    val synthN = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_SYNTH", "").trim
    val nqWant = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_NQ", "30").toInt
    val foldList = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_FOLD", "")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val heapMax = sys.env.getOrElse("SPARK_GRAFT_SORTSEL_HEAPMAX", "").trim
    val cpus = graft.Bench.probeCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sortsel-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.api.Similarity.RerankSizingConfKey, "warn")
      .config(graft.api.Similarity.PqConcConfKey, "warn")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.api.Similarity
    if (heapMax.nonEmpty) spark.conf.set(S.PqHeapSelectMaxKey, heapMax)
    val off = ScaleProbe.ReplicaOffset

    // stage log: (stageId, numTasks, name); cleared per timed leg so
    // each leg's selection width is separable
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages.add((i.stageId, i.numTasks, i.taskMetrics.executorRunTime,
          i.name.takeWhile(_ != '\n')))
        ()
      }
    })

    graft.api.Barrier.scoped {
      val dir =
        if (synthN.nonEmpty)
          ScaleProbe.ensureSynthMixedFixture(spark, synthN.toLong, 64, lam)
        else ScaleProbe.ensureMixedFixture(spark, src, reps, lam)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // replica fixtures: base-id × sign-replica grid; synthetic
      // fixtures have no replica structure — every (n/nq)th id (the
      // MixProbe id-spread rule, nq-parameterized)
      val queries =
        if (synthN.nonEmpty) emb.filter(
          pmod(col("vec_id"), lit(math.max(1L, n / nqWant))) === 0 &&
            col("vec_id") < n / nqWant * nqWant)
        else emb.filter(
          col("vec_id") % off < 3 && col("vec_id") / off < math.max(1,
            (nqWant + 2) / 3))
      val nq = queries.count()
      println(s"[sortsel] fixture reps=$reps lambda=$lam synth=$synthN " +
        s"n=$n nq=$nq rerank=$rerank (ceiling=${S.PqHeapSelectMaxDefault}, " +
        s"crossing=${nq * rerank > S.PqHeapSelectMaxDefault})")
      // train + encode once, outside every timed region
      val books = graft.api.Barrier(
        S.pqTrain(emb, "vec_id", "embedding", 8, 64, 2))
      val index = graft.api.Barrier(
        S.pqEncodeIndex(emb, books, "vec_id", "embedding"))
      println(s"[sortsel] index built: ${index.count()} rows")

      val foldOpts: Seq[Option[Int]] =
        if (foldList.isEmpty) Seq(None) else foldList.map(Some(_))
      for (salts <- saltsList; foldOpt <- foldOpts) {
        if (salts > 0)
          spark.conf.set(S.PqSortSelectSaltsKey, salts.toString)
        else spark.conf.unset(S.PqSortSelectSaltsKey)
        foldOpt match {
          case Some(f) => spark.conf.set(S.PqSortSelectFoldKey, f.toString)
          case None => spark.conf.unset(S.PqSortSelectFoldKey)
        }
        val foldTag = foldOpt.map(f => s" fold=$f").getOrElse("")
        val times = (1 to passes).map { p =>
          stages.clear()
          val t0 = System.nanoTime()
          graft.Bench.materialize(S.pqTopKFromIndex(
            index, emb, queries, books, "vec_id", "embedding", K, rerank))
          val sec = (System.nanoTime() - t0) / 1e9
          val st = {
            val it = stages.iterator()
            val b = Seq.newBuilder[(Int, Int, Long, String)]
            while (it.hasNext) b += it.next()
            b.result().sortBy(_._1)
          }
          val stageStr = st.map { case (id, t, rt, nm) =>
            s"$id:$t:${rt}ms" }.mkString(" ")
          println(f"[sortsel] salts=$salts$foldTag pass=$p wall=$sec%.2f s " +
            s"stage_tasks=[$stageStr]")
          // the selection stages are the post-scoring window sorts —
          // print names once per leg for attribution
          if (p == 1) st.foreach { case (id, t, rt, nm) =>
            println(s"[sortsel]   stage $id tasks=$t runtime=${rt}ms $nm") }
          sec
        }
        val effSalts = if (salts > 0) salts.toLong
          else math.min(64L, math.max(2L,
            (4L * cpus.toInt + nq - 1) / math.max(1L, nq)))
        println(f"[sortsel] salts=$salts$foldTag min-wall=${times.min}%.2f s " +
          s"(groups=${nq * effSalts})")
      }
      graft.api.Barrier.release(index)
      graft.api.Barrier.release(books)
    }
    spark.stop()
  }
}
