package org.apache.spark.shuffle.graft

import java.io.{BufferedInputStream, BufferedOutputStream, OutputStream}

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.{InterruptibleIterator, SparkConf, SparkEnv, TaskContext}
import org.apache.spark.deploy.SparkHadoopUtil
import org.apache.spark.internal.Logging
import org.apache.spark.scheduler.MapStatus
import org.apache.spark.serializer.SerializationStream
import org.apache.spark.shuffle.{BaseShuffleHandle, ShuffleBlockResolver, ShuffleHandle, ShuffleManager, ShuffleReadMetricsReporter, ShuffleReader, ShuffleWriteMetricsReporter, ShuffleWriter}
import org.apache.spark.shuffle.api.{ShuffleDataIO, ShuffleDriverComponents, ShuffleExecutorComponents}
import org.apache.spark.storage.{BlockId, ShuffleBlockId, ShuffleMergedBlockId}
import org.apache.spark.util.collection.ExternalSorter

/** Object-store shuffle: map output lives on a scheme-parameterized
  * Hadoop FileSystem instead of executor-local disk, so shuffle data
  * survives the executor that wrote it — the property the reference
  * gets by routing its shuffle through S3 (`/root/reference/emitter.go:90-120`
  * writes per-bin part files; `/root/reference/internal/pkg/corfs/s3_io.go:22-83`
  * is the multipart-upload/ranged-GET transport), which is what makes
  * its FaaS executors stateless-restartable. On a leased/decommissioning
  * backend (`lambda://`, LAMBDA.md §3.4) a lost invocation then costs
  * task retries only — never a map-stage re-run.
  *
  * Layout mirrors corral's per-bin objects: one object per
  * (map task, reduce bin) under
  * `<spark.graft.shuffle.dir>/<appId>/shuffle_<shuffleId>/map_<mapId>_part_<reduceId>.bin`.
  * `mapId` is Spark's map *task attempt* id, unique per attempt, so
  * speculative/retried attempts never clobber each other's objects and
  * only the registered (successful) attempt's objects are ever read.
  * Writes stream straight to the FS (no local spill copy); an object
  * store pays one multipart upload per non-empty bin, exactly corral's
  * write amplification. Reads open each object once, sequentially —
  * ranged GETs are unnecessary because a bin object contains exactly
  * one reducer's bytes (corral reads its bins the same way,
  * `s3_io.go:22-45`).
  *
  * Block bytes go through `SerializerManager.wrapStream`, so
  * `spark.shuffle.compress` (lz4) and IO encryption apply unchanged on
  * both sides.
  *
  * Enable with:
  * {{{
  *   spark.shuffle.manager=org.apache.spark.shuffle.graft.GraftShuffleManager
  *   spark.shuffle.sort.io.plugin.class=org.apache.spark.shuffle.graft.GraftShuffleDataIO
  *   spark.graft.shuffle.dir=<any Hadoop FS URI: s3a://bucket/prefix, graftfs://..., file:/...>
  * }}}
  * The DataIO plugin's driver components report
  * `supportsReliableStorage=true`, which tells the DAGScheduler NOT to
  * unregister a dead executor's map outputs — reducers re-read them
  * from the FS instead of triggering a map-stage re-run
  * (GraftShuffleSimSpec proves the skip across an invocation kill).
  *
  * Scale notes: sizing AQE statistics come from the real per-bin byte
  * lengths in `MapStatus`, so coalescing/skew-split behave exactly as
  * with local shuffle. M×R small objects is corral's trade too; at
  * very large R prefer raising `maxPartitionBytes`/AQE target sizes so
  * bins stay MB-scale. This manager lives in `org.apache.spark.*` only
  * for `private[spark]` seams (`MapStatus`, tracker, `ExternalSorter`)
  * — same precedent as the `lambda://` cluster manager.
  */
class GraftShuffleManager(conf: SparkConf) extends ShuffleManager with Logging {
  import GraftShuffleManager._

  // Secondary constructor form Spark's reflective loader also accepts.
  def this(conf: SparkConf, isDriver: Boolean) = this(conf)

  private val baseDir: String = {
    val d = conf.get(DirKey, null)
    require(d != null && d.nonEmpty,
      s"$DirKey must point at a shared filesystem URI when " +
        s"${classOf[GraftShuffleManager].getName} is the shuffle manager")
    d
  }

  private lazy val hadoopConf = SparkHadoopUtil.get.newConfiguration(conf)
  private[graft] lazy val fs: FileSystem = new Path(baseDir).getFileSystem(hadoopConf)
  // app id is assigned after SparkEnv (and this manager) is constructed
  private lazy val appDir = new Path(new Path(baseDir), conf.getAppId)

  private[graft] def shuffleDir(shuffleId: Int): Path =
    new Path(appDir, s"shuffle_$shuffleId")

  override def registerShuffle[K, V, C](
      shuffleId: Int,
      dependency: org.apache.spark.ShuffleDependency[K, V, C]): ShuffleHandle =
    new BaseShuffleHandle(shuffleId, dependency)

  override def getWriter[K, V](
      handle: ShuffleHandle,
      mapId: Long,
      context: TaskContext,
      metrics: ShuffleWriteMetricsReporter): ShuffleWriter[K, V] = {
    val h = handle.asInstanceOf[BaseShuffleHandle[K, V, _]]
    val dir = shuffleDir(h.shuffleId)
    fs.mkdirs(dir) // idempotent; a no-op namespace entry on object stores
    new GraftShuffleWriter(h, mapId, context, metrics, fs, dir)
  }

  override def getReader[K, C](
      handle: ShuffleHandle,
      startMapIndex: Int,
      endMapIndex: Int,
      startPartition: Int,
      endPartition: Int,
      context: TaskContext,
      metrics: ShuffleReadMetricsReporter): ShuffleReader[K, C] = {
    val h = handle.asInstanceOf[BaseShuffleHandle[K, _, C]]
    new GraftShuffleReader(h, startMapIndex, endMapIndex,
      startPartition, endPartition, context, metrics, fs, shuffleDir(h.shuffleId))
  }

  override def unregisterShuffle(shuffleId: Int): Boolean = {
    try fs.delete(shuffleDir(shuffleId), true)
    catch { case NonFatal(e) => logWarning(s"shuffle $shuffleId cleanup: $e") }
    true
  }

  override val shuffleBlockResolver: ShuffleBlockResolver =
    new GraftShuffleBlockResolver

  override def stop(): Unit = () // FS instances are JVM-cached and shared
}

object GraftShuffleManager {
  val DirKey = "spark.graft.shuffle.dir"

  private[graft] def binPath(shuffleDir: Path, mapId: Long, reduceId: Int): Path =
    new Path(shuffleDir, s"map_${mapId}_part_$reduceId.bin")
}

/** Per-bin streaming writer: one lazily-opened FS object per non-empty
  * reduce partition (corral's `emitter.go:90-120` bin layout). */
private[graft] class GraftShuffleWriter[K, V](
    handle: BaseShuffleHandle[K, V, _],
    mapId: Long,
    context: TaskContext,
    metrics: ShuffleWriteMetricsReporter,
    fs: FileSystem,
    shuffleDir: Path) extends ShuffleWriter[K, V] with Logging {

  private val dep = handle.dependency
  private val numBins = dep.partitioner.numPartitions
  private val lengths = new Array[Long](numBins)
  private val serInstance = dep.serializer.newInstance()
  private val serMgr = SparkEnv.get.serializerManager

  private final class CountingOutputStream(under: OutputStream) extends OutputStream {
    var count = 0L
    override def write(b: Int): Unit = { under.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); count += len
    }
    override def flush(): Unit = under.flush()
    override def close(): Unit = under.close()
  }

  private val counters = new Array[CountingOutputStream](numBins)
  private val bins = new Array[SerializationStream](numBins)
  private var stopped = false

  private def binFor(p: Int): SerializationStream = {
    if (bins(p) == null) {
      val raw = fs.create(GraftShuffleManager.binPath(shuffleDir, mapId, p), true)
      val counting = new CountingOutputStream(raw)
      // compression/encryption identical to local shuffle blocks
      val wrapped = serMgr.wrapStream(
        ShuffleBlockId(dep.shuffleId, mapId, p),
        new BufferedOutputStream(counting, 64 * 1024))
      counters(p) = counting
      bins(p) = serInstance.serializeStream(wrapped)
    }
    bins(p)
  }

  override def write(records: Iterator[Product2[K, V]]): Unit = {
    val start = System.nanoTime()
    // map-side combine before partitioning, like SortShuffleWriter
    val iter: Iterator[Product2[K, _]] =
      if (dep.mapSideCombine) {
        require(dep.aggregator.isDefined, "mapSideCombine without aggregator")
        dep.aggregator.get.combineValuesByKey(records, context)
      } else records
    var n = 0L
    while (iter.hasNext) {
      val rec = iter.next()
      val s = binFor(dep.partitioner.getPartition(rec._1))
      s.writeKey[Any](rec._1)
      s.writeValue[Any](rec._2)
      n += 1
    }
    var p = 0
    while (p < numBins) {
      if (bins(p) != null) { bins(p).close(); lengths(p) = counters(p).count }
      p += 1
    }
    metrics.incRecordsWritten(n)
    metrics.incBytesWritten(lengths.sum)
    metrics.incWriteTime(System.nanoTime() - start)
  }

  override def stop(success: Boolean): Option[MapStatus] = {
    if (stopped) return None
    stopped = true
    if (success) {
      Some(MapStatus(SparkEnv.get.blockManager.blockManagerId, lengths, mapId))
    } else {
      // failed/aborted attempt: close any open streams, drop its objects
      // (attempt-unique names mean nothing else can be reading them)
      (0 until numBins).foreach { p =>
        if (bins(p) != null) { try bins(p).close() catch { case NonFatal(_) => } }
        try fs.delete(GraftShuffleManager.binPath(shuffleDir, mapId, p), false)
        catch { case NonFatal(_) => }
      }
      None
    }
  }

  override def getPartitionLengths(): Array[Long] = lengths
}

/** Reads the bin objects for `[startPartition, endPartition)` of the
  * maps `[startMapIndex, endMapIndex)` straight from the FS — the
  * writing executor does not need to be alive. Which (map, bin)
  * objects exist and are non-empty comes from the driver's
  * MapOutputTracker, same as local shuffle. */
private[graft] class GraftShuffleReader[K, C](
    handle: BaseShuffleHandle[K, _, C],
    startMapIndex: Int,
    endMapIndex: Int,
    startPartition: Int,
    endPartition: Int,
    context: TaskContext,
    metrics: ShuffleReadMetricsReporter,
    fs: FileSystem,
    shuffleDir: Path) extends ShuffleReader[K, C] {

  private val dep = handle.dependency

  override def read(): Iterator[Product2[K, C]] = {
    val serInstance = dep.serializer.newInstance()
    val serMgr = SparkEnv.get.serializerManager
    val blocks: Iterator[(BlockId, Long)] = SparkEnv.get.mapOutputTracker
      .getMapSizesByExecutorId(
        dep.shuffleId, startMapIndex, endMapIndex, startPartition, endPartition)
      .flatMap { case (_, blockSizes) =>
        blockSizes.map { case (bid, size, _) => (bid, size) }
      }
    val recordIter: Iterator[(Any, Any)] = blocks
      .filter(_._2 > 0) // empty bins wrote no object
      .flatMap {
        case (bid @ ShuffleBlockId(_, blockMapId, reduceId), size) =>
          val path = GraftShuffleManager.binPath(shuffleDir, blockMapId, reduceId)
          metrics.incRemoteBlocksFetched(1)
          // Size comes from the MapOutputTracker's registered MapStatus —
          // no per-block getFileStatus (on an object store that would be
          // one HEAD request per (map, bin) object per reduce task).
          metrics.incRemoteBytesRead(size)
          val in = serMgr.wrapStream(bid,
            new BufferedInputStream(fs.open(path), 64 * 1024))
          // asKeyValueIterator closes the stream at EOF
          serInstance.deserializeStream(in).asKeyValueIterator
        case (other, _) =>
          // batch/merged ids come from fetch-protocol paths this manager
          // never engages; fail loud rather than mis-read
          throw new UnsupportedOperationException(
            s"unexpected shuffle block id under GraftShuffleManager: $other")
      }
      .map { r => metrics.incRecordsRead(1); r }

    val interruptible =
      new InterruptibleIterator[(Any, Any)](context, recordIter)
    val aggregated: Iterator[Product2[K, C]] =
      if (dep.aggregator.isDefined) {
        if (dep.mapSideCombine) {
          dep.aggregator.get.combineCombinersByKey(
            interruptible.asInstanceOf[Iterator[(K, C)]], context)
        } else {
          dep.aggregator.get.combineValuesByKey(
            interruptible.asInstanceOf[Iterator[(K, Nothing)]], context)
        }
      } else {
        interruptible.asInstanceOf[Iterator[Product2[K, C]]]
      }
    dep.keyOrdering match {
      case Some(ord) =>
        // spill-safe sort, exactly BlockStoreShuffleReader's tail
        val sorter = new ExternalSorter[K, C, C](
          context, ordering = Some(ord), serializer = dep.serializer)
        sorter.insertAllAndUpdateMetrics(aggregated)
      case None => aggregated
    }
  }
}

/** No executor-served shuffle blocks exist under this manager — every
  * read goes straight to the shared FS — so the resolver's only job is
  * to refuse loudly if some path tries to fetch through a BlockManager. */
private[graft] class GraftShuffleBlockResolver extends ShuffleBlockResolver {
  override def getBlockData(
      blockId: BlockId,
      dirs: Option[Array[String]]): org.apache.spark.network.buffer.ManagedBuffer =
    throw new UnsupportedOperationException(
      "GraftShuffleManager serves shuffle from the shared FS, not the BlockManager")
  override def getMergedBlockData(
      blockId: ShuffleMergedBlockId,
      dirs: Option[Array[String]]): Seq[org.apache.spark.network.buffer.ManagedBuffer] =
    throw new UnsupportedOperationException("push-based merge is not supported")
  override def getMergedBlockMeta(
      blockId: ShuffleMergedBlockId,
      dirs: Option[Array[String]]): org.apache.spark.network.shuffle.MergedBlockMeta =
    throw new UnsupportedOperationException("push-based merge is not supported")
  override def stop(): Unit = ()
}

/** Companion ShuffleDataIO plugin. Its single load-bearing bit is
  * `supportsReliableStorage=true`: the DAGScheduler then keeps a dead
  * executor's map outputs registered (no map-stage re-run on executor
  * loss), because the bytes live on the shared FS, not the executor —
  * the exact reliability contract corral's S3 shuffle provides its
  * one-shot Lambda workers. Also owns shuffle/app FS cleanup on the
  * driver (ContextCleaner → `removeShuffle`; app stop →
  * `cleanupApplication`). */
class GraftShuffleDataIO(conf: SparkConf) extends ShuffleDataIO {
  override def driver(): ShuffleDriverComponents =
    new GraftShuffleDriverComponents(conf)
  // executor components are only consumed by SortShuffleManager's
  // writers, which this deployment replaces; delegate to the stock
  // local-disk impl so the contract stays satisfied if mixed
  override def executor(): ShuffleExecutorComponents =
    new org.apache.spark.shuffle.sort.io.LocalDiskShuffleDataIO(conf).executor()
}

class GraftShuffleDriverComponents(conf: SparkConf)
    extends ShuffleDriverComponents with Logging {

  private def withFs(body: (FileSystem, Path) => Unit): Unit = {
    val base = conf.get(GraftShuffleManager.DirKey, null)
    if (base != null && base.nonEmpty) {
      try {
        val appDir = new Path(new Path(base), conf.getAppId)
        body(appDir.getFileSystem(SparkHadoopUtil.get.newConfiguration(conf)), appDir)
      } catch { case NonFatal(e) => logWarning(s"shuffle FS cleanup: $e") }
    }
  }

  override def initializeApplication(): java.util.Map[String, String] =
    java.util.Collections.emptyMap()

  override def cleanupApplication(): Unit =
    withFs((fs, appDir) => fs.delete(appDir, true))

  override def removeShuffle(shuffleId: Int, blocking: Boolean): Unit =
    withFs((fs, appDir) => fs.delete(new Path(appDir, s"shuffle_$shuffleId"), true))

  override def supportsReliableStorage(): Boolean = true
}
