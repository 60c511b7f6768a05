package graft.shuffle

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.HashPartitioner
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.shuffle.graft.{GraftShuffleDriverComponents, GraftShuffleManager}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Counts stage submissions and fetch-failures; the shuffle suites use
  * it to prove map-stage reuse (a skipped stage is never re-submitted). */
class StageCounter extends SparkListener {
  val stages = new ConcurrentLinkedQueue[Int]()
  val fetchFailed = new ConcurrentLinkedQueue[String]()
  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
    stages.add(s.stageInfo.stageId)
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = t.reason match {
    case r: org.apache.spark.FetchFailed => fetchFailed.add(r.toErrorString)
    case _ =>
  }
}

/** The object-store shuffle (task: corral's S3 bin shuffle,
  * `/root/reference/emitter.go:90-120`) running a real workload mix:
  * every byte of shuffle in this suite moves through consolidated
  * per-map data+idx objects on the `graftfs://` FileSystem — the same
  * registered-scheme stand-in for S3 that FsSchemeSpec uses — never
  * through executor-local disk.
  * Runs in its own forked JVM (build.sbt testGrouping): the shuffle
  * manager is a static conf on the SparkContext. */
class GraftShuffleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    base = Files.createTempDirectory("graft-shuffle-bins")
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-shuffle-spec")
      .config("spark.shuffle.manager", classOf[GraftShuffleManager].getName)
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.GraftShuffleDataIO")
      .config(GraftShuffleManager.DirKey, s"graftfs://$base/shuffle")
      .config("spark.hadoop.fs.graftfs.impl", classOf[graft.mr.GraftObjectFs].getName)
      .config("spark.hadoop.fs.graftfs.impl.disable.cache", "true")
      .config("spark.sql.shuffle.partitions", "7")
      // this suite asserts on the ON-DISK shuffle objects: the
      // GC-driven ContextCleaner must not race the assertions by
      // removing an earlier test's shuffle dirs mid-Files.walk
      // (observed as a flaky NoSuchFileException in removeShuffle's
      // listing); explicit cleanup is exercised via removeShuffle
      .config("spark.cleaner.referenceTracking", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def shuffleObjects(): Seq[java.nio.file.Path] = {
    if (!Files.exists(base)) return Seq.empty
    val s = Files.walk(base)
    try s.iterator().asScala.toList
      .filter(_.getFileName.toString.matches("map_\\d+\\.(data|idx)"))
    finally s.close()
  }

  private def eventually[A](timeoutSec: Int)(body: => A): A = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    var last: Throwable = null
    while (System.nanoTime() < deadline) {
      try return body
      catch { case e: Throwable => last = e; Thread.sleep(200) }
    }
    throw new AssertionError(s"condition not met within ${timeoutSec}s", last)
  }

  test("SQL aggregate is exact and its shuffle bins land on graftfs://") {
    val n = 100000L
    val agg = spark.range(0, n, 1, 8)
      .select((col("id") % 97).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s"), count("*").as("c"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(agg.keySet == (0L until 97L).toSet)
    assert(agg.values.map(_._1).sum == n * (n - 1) / 2)
    assert(agg.values.map(_._2).sum == n)
    // k=0 group exactly: 0 + 97 + 194 + ...
    val zeros = (0L until n by 97L)
    assert(agg(0L) == (zeros.sum, zeros.size.toLong))
    val objs = shuffleObjects()
    assert(objs.nonEmpty, s"no shuffle objects under $base")
    // consolidation pin (round-11 task #1): exactly ONE data + ONE idx
    // object per map task that produced output — never one per
    // (map, bin) (the old M×N layout this round replaced; with 7
    // reduce bins it wrote 7× the objects per map)
    val byKind = objs.groupBy(_.getFileName.toString.split("\\.").last)
    val dataIds = byKind("data").map(_.getFileName.toString).toSet
    val idxIds = byKind("idx").map(_.getFileName.toString
      .stripSuffix(".idx") + ".data").toSet
    assert(dataIds == idxIds, "every data object must have exactly one idx twin")
  }

  test("SQL sort-merge join through AQE partition ranges is exact") {
    val fact = spark.range(0, 50000, 1, 8)
      .select((col("id") % 200).as("k"), col("id").as("v"))
    val dim = spark.range(0, 200).select(col("id").as("k"), (col("id") * 3).as("w"))
    val joined = fact.join(dim, "k").agg(sum(col("v") * col("w")).as("t"))
      .collect().head.getLong(0)
    val expected = (0L until 50000L).map(v => v * ((v % 200) * 3)).sum
    assert(joined == expected)
  }

  test("RDD reduceByKey (map-side combine) and groupByKey are exact") {
    val sc = spark.sparkContext
    val data = sc.parallelize(0 until 20000, 8).map(i => (i % 131, i.toLong))
    val expected = (0 until 20000).map(i => (i % 131, i.toLong))
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(data.reduceByKey(_ + _).collect().toMap == expected)
    assert(data.groupByKey(13).mapValues(_.sum).collect().toMap == expected)
  }

  test("repartitionAndSortWithinPartitions honors partitioner and keyOrdering") {
    val sc = spark.sparkContext
    val data = sc.parallelize(0 until 9973, 8).map(i => ((i * 7919) % 997, i))
    val parts = data.repartitionAndSortWithinPartitions(new HashPartitioner(5))
      .mapPartitionsWithIndex { case (pid, it) =>
        Iterator((pid, it.map(_._1).toArray))
      }.collect()
    assert(parts.map(_._2.length).sum == 9973)
    parts.foreach { case (pid, keys) =>
      assert(keys.sameElements(keys.sorted), s"partition $pid not key-sorted")
      keys.foreach(k => assert(math.floorMod(k.hashCode, 5) == pid))
    }
  }

  test("second job over the same dependency skips the map stage") {
    val sc = spark.sparkContext
    val counter = new StageCounter
    sc.addSparkListener(counter)
    try {
      val shuffled = sc.parallelize(0 until 10000, 6)
        .map(i => (i % 17, 1L)).reduceByKey(_ + _)
      assert(shuffled.collect().toMap.values.sum == 10000L)
      val afterFirst = eventually(10) {
        val n = counter.stages.size; assert(n >= 2); n
      }
      assert(shuffled.collect().toMap.values.sum == 10000L)
      eventually(10)(assert(counter.stages.size == afterFirst + 1,
        s"map stage was re-submitted: ${counter.stages.asScala.toList}"))
      assert(counter.fetchFailed.isEmpty)
    } finally sc.removeSparkListener(counter)
  }

  test("tiny-map cache reads account as local, not phantom remote fetches") {
    val sc = spark.sparkContext
    val remoteBlocks = new java.util.concurrent.atomic.AtomicLong(0)
    val localBlocks = new java.util.concurrent.atomic.AtomicLong(0)
    val remoteBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          remoteBlocks.addAndGet(t.taskMetrics.shuffleReadMetrics.remoteBlocksFetched)
          localBlocks.addAndGet(t.taskMetrics.shuffleReadMetrics.localBlocksFetched)
          remoteBytes.addAndGet(t.taskMetrics.shuffleReadMetrics.remoteBytesRead)
        }
    }
    sc.addSparkListener(listener)
    try {
      // ONE tiny map, 7 reduce bins on 4 threads: each reduce task asks
      // for 1 segment of the same ≤4 MB object. The pre-cache
      // accounting reported 7 remote fetches (one per segment); the
      // truthful accounting reports one remote read of the WHOLE
      // object per cache MISS (first wave, ≤4 concurrent) and a LOCAL
      // read per cache hit (second wave, ≥3 of 7)
      val result = sc.parallelize(0 until 10000, 1)
        .map(i => (i % 7, 1L)).reduceByKey(new HashPartitioner(7), _ + _)
        .collect().toMap
      assert(result.values.sum == 10000L)
      eventually(10) {
        assert(remoteBlocks.get + localBlocks.get == 7,
          s"blocks: remote=${remoteBlocks.get} local=${localBlocks.get}")
      }
      assert(remoteBlocks.get >= 1 && remoteBlocks.get <= 4,
        s"misses exceed concurrency: ${remoteBlocks.get}")
      assert(localBlocks.get >= 3, s"no cache hits accounted local: ${localBlocks.get}")
      // each accounted remote read is the whole data object, so total
      // remote bytes = misses x object size exactly
      val dataObjects = shuffleObjects().filter(_.getFileName.toString.endsWith(".data"))
      val lastObjSize = Files.size(dataObjects.maxBy(Files.getLastModifiedTime(_)))
      assert(remoteBytes.get == remoteBlocks.get * lastObjSize,
        s"remote bytes ${remoteBytes.get} != ${remoteBlocks.get} x $lastObjSize")
    } finally sc.removeSparkListener(listener)
  }

  test("removeShuffle deletes that shuffle's bin objects, leaves others") {
    val shuffleDirs = {
      val s = Files.walk(base)
      try s.iterator().asScala.toList
        .filter(_.getFileName.toString.startsWith("shuffle_"))
      finally s.close()
    }
    assert(shuffleDirs.size >= 2, s"expected several shuffles, got $shuffleDirs")
    val victim = shuffleDirs.head
    val id = victim.getFileName.toString.stripPrefix("shuffle_").toInt
    new GraftShuffleDriverComponents(spark.sparkContext.getConf)
      .removeShuffle(id, true)
    assert(!Files.exists(victim))
    assert(shuffleDirs.tail.forall(Files.exists(_)), "unrelated shuffle deleted")
  }
}
