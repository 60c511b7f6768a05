package graft.mr

import org.apache.spark.Partitioner
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** MR facade — the reference's programming model re-expressed on Spark.
  *
  * Contracts mirror corral's user hooks (SURVEY.md §2.4):
  *  - `Mapper.map`: one record in, 0..n KV out
  *    (`/root/reference/mapreduce.go:22-24`); instances are deserialized
  *    per task, so mutable mapper state is per-partition state, matching
  *    corral's per-task mapper state (`/root/reference/README.md:203`).
  *  - `Reducer.reduce`: key + lazy value iterator → 0..n KV out
  *    (`/root/reference/mapreduce.go:27-29`). Unlike the reference, the
  *    iterator is truly out-of-core (corral buffers every value for a bin
  *    in memory, `/root/reference/job.go:120-153`).
  *  - `PartitionFunc`: key + numBins → bin
  *    (`/root/reference/mapreduce.go:31-34`).
  *
  * Values arrive at the reducer in arbitrary order, and all values for a
  * key are presented in a single `reduce` call — corral's two documented
  * guarantees (`/root/reference/README.md:213-215`).
  */
trait Mapper extends Serializable {
  def map(key: String, value: String): IterableOnce[(String, String)]
}

trait Reducer extends Serializable {
  def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)]
}

/** A reducer that is a commutative monoid over values. Declaring this
  * lets the engine run map-side partial aggregation (a combiner) — the
  * optimization corral explicitly lacks (word_count shuffles one pair
  * per word *occurrence*, `/root/reference/examples/word_count/word_count.go:22`)
  * and the single biggest shuffle-volume win at 100 TB.
  */
trait AssociativeReducer extends Reducer {
  def combine(a: String, b: String): String
  final override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] =
    if (values.isEmpty) Iterator.empty
    else Iterator(key -> values.reduce(combine))
}

object MapReduce {
  type KV = (String, String)
  implicit val kvEncoder: Encoder[KV] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
  implicit val stringEncoder: Encoder[String] = Encoders.STRING

  /** RDD Partitioner adapter for corral's PartitionFunc (F8). Only used
    * when a custom partitioner is supplied — the default hash partition
    * (F7) is Spark's own Exchange, which never materializes bin files. */
  private[mr] final class FuncPartitioner(n: Int, f: (String, Int) => Int)
      extends Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = {
      val b = f(key.asInstanceOf[String], n)
      require(b >= 0 && b < n, s"partition function returned $b for numBins=$n")
      b
    }
  }

  /** Lazily walks a key-sorted record iterator as (key, value-run)
    * groups — O(1) memory regardless of group size. If a reducer
    * doesn't fully consume a run, the leftover records are skipped
    * before the next group starts. */
  private[mr] final class GroupedRuns(it: scala.collection.BufferedIterator[KV])
      extends Iterator[(String, Iterator[String])] {
    private var lastKey: String = _
    private var started = false

    private def skipLeftovers(): Unit =
      if (started) while (it.hasNext && it.head._1 == lastKey) it.next()

    override def hasNext: Boolean = { skipLeftovers(); it.hasNext }

    override def next(): (String, Iterator[String]) = {
      skipLeftovers()
      val k = it.head._1
      lastKey = k
      started = true
      val run = new Iterator[String] {
        override def hasNext: Boolean = it.hasNext && it.head._1 == k
        override def next(): String = it.next()._2
      }
      (k, run)
    }
  }
}

/** One MapReduce job (reference `Job`, `/root/reference/job.go:230-236`).
  *
  * `numBins` mirrors the reduce-bin count heuristic slot
  * (`/root/reference/job.go:221-224`); left at None, Spark's AQE sizes
  * post-shuffle partitions from actual map-output statistics — a strict
  * superset of corral's 1.25×-input-bytes guess.
  */
final case class CorralJob(
    mapper: Mapper,
    reducer: Reducer,
    partitionFunc: Option[(String, Int) => Int] = None,
    numBins: Option[Int] = None) {

  import MapReduce._

  def run(input: Dataset[KV]): Dataset[KV] = {
    val spark = input.sparkSession
    val m = mapper
    val mapped = input.flatMap { case (k, v) => m.map(k, v) }

    (partitionFunc, reducer) match {
      case (Some(pf), r) =>
        // Custom routing must be honored exactly: drop to the RDD layer
        // with a real Partitioner. Records are sorted within each bin
        // during the shuffle (ExternalSorter → spills to disk), so the
        // per-key groups are contiguous runs walked lazily — nothing
        // buffers a partition in memory, unlike corral's reducer which
        // holds every value of a bin (job.go:120-153). Keys still meet
        // the facade contract: all values of a key in ONE reduce call,
        // value order unspecified.
        val n = numBins.getOrElse(spark.sessionState.conf.numShufflePartitions)
        val partitioned = mapped.rdd
          .map(kv => (kv._1, kv._2))
          .repartitionAndSortWithinPartitions(new FuncPartitioner(n, pf))
        val reduced = partitioned.mapPartitions { it =>
          new GroupedRuns(it.buffered).flatMap { case (k, vs) =>
            r.reduce(k, vs)
          }
        }
        spark.createDataset(reduced)
      case (None, ar: AssociativeReducer) =>
        // Combiner path: partial (map-side) + final merge, spillable.
        mapped.groupByKey(_._1)
          .reduceGroups((a: KV, b: KV) => (a._1, ar.combine(a._2, b._2)))
          .map(_._2)
      case (None, r) =>
        mapped.groupByKey(_._1)
          .flatMapGroups((k: String, it: Iterator[KV]) => r.reduce(k, it.map(_._2)).iterator)
    }
  }

  /** Convenience: run over raw lines (empty key), as corral does for
    * non-TSV input (`/root/reference/job.go:52-63`). */
  def runOnLines(lines: Dataset[String]): Dataset[KV] =
    run(lines.map(l => TextKV.splitInputRecord(l)))
}

/** Typed MR hooks: the same contract as [[Mapper]]/[[Reducer]] but over
  * Encoder-backed record types, so intermediate records cross the
  * shuffle as compact Tungsten binary rows instead of TSV/JSON strings.
  * This is the "what corral would look like with a serialization layer"
  * path — the string-KV facade measures the reference's actual wire
  * cost; this one is the scale-friendly form (same hooks, same
  * guarantees: arbitrary value order, one reduce call per key).
  */
trait TypedMapper[V, K, U] extends Serializable {
  def map(value: V): IterableOnce[(K, U)]
}

trait TypedReducer[K, U, O] extends Serializable {
  def reduce(key: K, values: Iterator[U]): IterableOnce[O]
}

final case class TypedJob[V, K, U, O](
    mapper: TypedMapper[V, K, U],
    reducer: TypedReducer[K, U, O])(
    implicit kuEnc: Encoder[(K, U)], kEnc: Encoder[K], oEnc: Encoder[O]) {

  def run(input: Dataset[V]): Dataset[O] =
    input.flatMap((v: V) => mapper.map(v))(kuEnc)
      // group on the native tuple column — unlike groupByKey(_._1),
      // this adds no AppendColumns node (no per-row deserialization
      // just to re-derive the key the row already carries)
      .groupBy(org.apache.spark.sql.functions.col("_1")).as[K, (K, U)](kEnc, kuEnc)
      .flatMapGroups((k: K, it: Iterator[(K, U)]) =>
        reducer.reduce(k, it.map(_._2)).iterator)(oEnc)
}

/** Multi-stage driver (reference `NewMultiStageDriver`,
  * `/root/reference/driver.go:88-93,195-216`). Stages compose lazily —
  * Catalyst optimizes across stage boundaries, where corral forces a
  * full TSV materialization barrier between jobs. `runMaterialized`
  * reproduces the barrier when explicitly wanted.
  */
final case class MultiStageDriver(jobs: Seq[CorralJob]) {
  import MapReduce._

  def run(input: Dataset[KV]): Dataset[KV] =
    jobs.foldLeft(input)((ds, job) => job.run(ds))

  /** `workDir` defaults to the config cascade's workingLocation
    * (`GRAFT_WORKING_LOCATION`, reference `/root/reference/config.go:30`),
    * falling back to a fresh temp dir.
    *
    * Intermediate cleanup (F12, reference `/root/reference/job.go:146-152`):
    * all stage dirs except the last are deleted as soon as the final
    * stage's TSV is written; the last one must outlive this call (the
    * returned Dataset reads it lazily), so a fallback temp workDir is
    * removed by a session-end hook instead. */
  def runMaterialized(input: Dataset[KV], workDir: String = ""): Dataset[KV] = {
    val spark = input.sparkSession
    val usedFallback = workDir.isEmpty &&
      graft.GraftSession.fromEnv().workingLocation.isEmpty
    val dir =
      if (workDir.nonEmpty) workDir
      else graft.GraftSession.fromEnv().workingLocation.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-stages").toString)
    val result = jobs.zipWithIndex.foldLeft(input) { case (ds, (job, i)) =>
      val out = job.run(ds)
      val stageDir = s"$dir/job$i"
      TextKV.writeTsv(out, stageDir)
      TextKV.readTsv(spark, stageDir)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    (0 until jobs.length - 1).foreach(i => deleteDir(s"$dir/job$i", conf))
    if (usedFallback) deleteOnSessionEnd(spark, dir)
    result
  }

  /** Scheme-aware recursive delete (workDirs may be non-local URIs). */
  private def deleteDir(path: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, true): Unit
  }

  private def deleteOnSessionEnd(spark: SparkSession, dir: String): Unit =
    MultiStageDriver.SessionEndCleanup.register(spark, dir)
}

object MultiStageDriver {
  /** One listener per SparkContext holding every fallback temp dir to
    * delete at application end. Registering a fresh listener per
    * `runMaterialized` call would accumulate listeners (and retained
    * dir strings) without bound in long-lived sessions. */
  private[mr] object SessionEndCleanup {
    private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

    private[mr] def pendingCount: Int = dirs.size()

    def register(spark: SparkSession, dir: String): Unit = {
      dirs.add(dir)
      if (registered.compareAndSet(false, true)) {
        val conf = spark.sparkContext.hadoopConfiguration
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              dirs.forEach { d =>
                val p = new org.apache.hadoop.fs.Path(d)
                p.getFileSystem(conf).delete(p, true): Unit
              }
              dirs.clear()
              // A later SparkContext in the same JVM gets its own listener.
              registered.set(false)
            }
          })
      }
    }
  }
}
