package org.apache.spark.shuffle.graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, OutputStream}

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.{InterruptibleIterator, SparkConf, SparkEnv, TaskContext}
import org.apache.spark.deploy.SparkHadoopUtil
import org.apache.spark.internal.Logging
import org.apache.spark.network.util.LimitedInputStream
import org.apache.spark.scheduler.MapStatus
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
  * Layout CONSOLIDATES corral's per-bin objects (`emitter.go:90-120`
  * writes one part file per (map, bin) — M×N small objects per
  * shuffle, the small-files pathology its own author concedes for
  * joins, `examples/amplab3/README.md:15`) into TWO objects per map
  * task attempt under
  * `<spark.graft.shuffle.dir>/<appId>/shuffle_<shuffleId>/`:
  *
  *   - `map_<mapId>.data` — every reduce bin's bytes, concatenated in
  *     bin order; each bin is an independently framed (compressed +
  *     encrypted) segment, so a reducer decodes its segment without
  *     touching the others
  *   - `map_<mapId>.idx`  — the per-bin segment lengths (numBins
  *     longs); prefix sums give each segment's byte offset
  *
  * That cuts object creates per shuffle from M×N to 2M — the RPC that
  * dominates iterative fixpoint queries (dd6/p2/dd10p chain dozens of
  * tiny stages; at ~2 create round-trips per object on a store like
  * S3, the old layout paid 32× more of them per stage). Two objects,
  * not one, deliberately: folding the idx into the data object as a
  * footer would save the second PUT but cost every FIRST reader of a
  * map a getFileStatus (a HEAD on an object store — the footer's
  * offset is `length − 8×numBins`, and the length is unknown until
  * asked) before the ranged GET, i.e. it trades one write-side RPC
  * for one read-side RPC and loses the JVM-wide idx cache's ability
  * to skip the data object entirely when a reducer's segments are all
  * empty. Nor can the offsets ride in `MapStatus`: its per-bin sizes
  * are lossily compressed (log-bucketed; averaged beyond 2000 bins),
  * good for scheduling but useless as byte offsets. Records are
  * grouped by bin with a spill-safe [[ExternalSorter]] before the
  * single sequential upload (exactly `SortShuffleWriter`'s shape), so
  * the write path stays one streaming PUT per map task regardless of
  * bin count. `mapId` is Spark's map *task attempt* id, unique per
  * attempt, so speculative/retried attempts never clobber each
  * other's objects and only the registered (successful) attempt's
  * objects are ever read.
  *
  * Reads: a reducer groups its requested blocks by map, reads the
  * map's idx object once (cached JVM-wide — on a multi-slot executor
  * every reduce task after the first hits the cache), opens the data
  * object once, and seeks to each requested segment (a ranged GET on
  * an object store; consecutive bins under AQE coalescing are
  * adjacent byte ranges). No per-block getFileStatus: segment sizes
  * come from the idx, never a HEAD request.
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
  * with local shuffle. The consolidation TRADES the old layout's
  * zero-staging writes (per-bin streams straight to the FS, ~64 KB
  * local footprint) for ExternalSorter staging: a map task's output
  * now passes through execution memory with overflow spilled to
  * executor-local scratch before the one sequential upload — the same
  * profile as stock SortShuffleWriter. On FaaS workers with small
  * ephemeral storage, size inputs so one map task's output fits the
  * scratch allowance (`maxPartitionBytes` caps input per map, and
  * shuffle output is usually ≤ input; Lambda ephemeral storage is
  * configurable to 10 GB — corral budgets the same way, its emitter
  * buffers bins in invocation memory). This manager lives in
  * `org.apache.spark.*` only for `private[spark]` seams (`MapStatus`,
  * tracker, `ExternalSorter`) — same precedent as the `lambda://`
  * cluster manager.
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
    GraftShuffleManager.purgeShuffle(shuffleDir(shuffleId).toString)
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

  private[graft] def dataPath(shuffleDir: Path, mapId: Long): Path =
    new Path(shuffleDir, s"map_$mapId.data")

  private[graft] def indexPath(shuffleDir: Path, mapId: Long): Path =
    new Path(shuffleDir, s"map_$mapId.idx")

  /** JVM-wide idx cache: every reduce task on a multi-slot executor
    * after the first reads a map's segment table from memory instead
    * of the FS. Keyed by (shuffle dir, mapId) — the dir embeds the
    * app id, so sequential SparkContexts in one JVM (tests) can never
    * alias each other's shuffle 0 / attempt 0. An entry is
    * 8 × numBins bytes, so the cap is BYTE-based (64 MB), not
    * entry-based: at 32 bins that is ~250k entries, at 10k reduce
    * bins still ~800 — the cap can't pin hundreds of MB on a
    * wide-shuffle executor. Eviction is a dumb full clear: the cache
    * is a pure optimization (a miss re-reads a tiny idx object), and
    * clear-on-cap is cheaper than LRU bookkeeping on every hit. */
  private val idxCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Array[Long]]()
  private val idxCacheBytes = new java.util.concurrent.atomic.AtomicLong(0)
  private val IdxCacheMaxBytes = 64L << 20

  /** Test seam: the byte counter the cap compares against. Invariant
    * (ShuffleIdxCacheSpec): always equals 8 × Σ entry lengths. */
  private[graft] def idxCacheSizeBytes: Long = idxCacheBytes.get()

  private[graft] def segmentLengths(fs: FileSystem, shuffleDir: Path,
      mapId: Long, numBins: Int): Array[Long] = {
    val key = (shuffleDir.toString, mapId)
    val hit = idxCache.get(key)
    if (hit != null && hit.length == numBins) return hit
    val in = new DataInputStream(
      new BufferedInputStream(fs.open(indexPath(shuffleDir, mapId))))
    val lens = try Array.fill(numBins)(in.readLong()) finally in.close()
    // Insert under a lock so the byte counter exactly tracks the map's
    // contents (lock-free addAndGet + put let two same-key misses
    // double-count, and a put racing clear() left entries the counter
    // had erased). Hits above stay lock-free; a miss already paid an FS
    // round-trip, so the lock is noise. Two same-key misses race to the
    // FS read, the loser sees the winner's entry here and skips.
    idxCache.synchronized {
      val cur = idxCache.get(key)
      if (cur == null || cur.length != numBins) {
        if (cur != null) idxCacheBytes.addAndGet(-8L * cur.length)
        if (idxCacheBytes.get() + 8L * numBins > IdxCacheMaxBytes) {
          idxCache.clear()
          idxCacheBytes.set(0L)
        }
        idxCache.put(key, lens)
        idxCacheBytes.addAndGet(8L * numBins)
      }
    }
    lens
  }

  /** JVM-wide SMALL data-object cache — the tiny-stage companion to the
    * idx cache. The iterative fixpoints (dd6/p2/dd10p/p4p) chain dozens
    * of stages whose whole map output is a few KB, yet every reduce
    * task on the executor re-opened every map's data object: N opens
    * per map per executor for bytes that fit in one GET. The idx gives
    * a map output's TOTAL size before the data object is touched, so a
    * map whose output is ≤ [[SmallDataMaxBytes]] is fetched whole
    * exactly once per executor and every co-located reduce task decodes
    * its segment from memory — data-object opens for a tiny stage drop
    * from M × (reduce tasks on the executor) to M. Large maps keep the
    * open-once/seek-per-segment streaming path: caching them would
    * evict constantly and buffer bytes most reducers don't want.
    * Same accounting discipline as the idx cache: insert under a lock
    * so the byte counter exactly tracks contents, stale wrong-length
    * entries re-accounted, clear-on-cap eviction (a miss just re-reads
    * one small object). Entries are immutable — attempt-unique object
    * names and the app-id-embedding dir mean a key can never alias
    * different bytes; readers hold their own reference, so a clear()
    * under them is GC-safe. */
  private[graft] val SmallDataMaxBytes = 4L << 20
  private val dataCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Array[Byte]]()
  private val dataCacheBytes = new java.util.concurrent.atomic.AtomicLong(0)
  private val DataCacheMaxBytes = 128L << 20

  /** Test seam: invariant (ShuffleDataCacheSpec) — always equals
    * Σ cached entry lengths. */
  private[graft] def dataCacheSizeBytes: Long = dataCacheBytes.get()

  /** Returns (bytes, servedFromCache) — the flag lets the reader
    * account a hit as a LOCAL read and a miss as ONE remote read of
    * the whole object, so shuffle-read metrics state actual FS
    * traffic instead of per-reduce-task phantom fetches. */
  private[graft] def smallDataBytes(fs: FileSystem, shuffleDir: Path,
      mapId: Long, totalLen: Long): (Array[Byte], Boolean) = {
    val key = (shuffleDir.toString, mapId)
    val hit = dataCache.get(key)
    if (hit != null && hit.length == totalLen) return (hit, true)
    val buf = new Array[Byte](totalLen.toInt)
    val in = fs.open(dataPath(shuffleDir, mapId))
    try in.readFully(0L, buf) finally in.close()
    dataCache.synchronized {
      val cur = dataCache.get(key)
      if (cur == null || cur.length != totalLen) {
        if (cur != null) dataCacheBytes.addAndGet(-cur.length.toLong)
        if (dataCacheBytes.get() + totalLen > DataCacheMaxBytes) {
          dataCache.clear()
          dataCacheBytes.set(0L)
        }
        dataCache.put(key, buf)
        dataCacheBytes.addAndGet(totalLen)
      }
    }
    (buf, false)
  }

  /** Drop every cached idx/data entry of one shuffle. Called from
    * `unregisterShuffle` — which the BlockManager's `RemoveShuffle`
    * handler invokes on every executor, so cluster mode is covered,
    * not just local[N] — to keep the byte-capped caches holding live
    * shuffles only instead of waiting for cap eviction. Removal runs
    * under the same locks the inserts use, so the byte counters stay
    * exact against concurrent misses; a straggler task re-inserting
    * after the purge is harmless (entries are immutable and
    * dir-unique, and the cap clears residue). */
  private[graft] def purgeShuffle(shuffleDir: String): Unit = {
    idxCache.synchronized {
      val it = idxCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == shuffleDir) {
          idxCacheBytes.addAndGet(-8L * e.getValue.length)
          it.remove()
        }
      }
    }
    dataCache.synchronized {
      val it = dataCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 == shuffleDir) {
          dataCacheBytes.addAndGet(-e.getValue.length.toLong)
          it.remove()
        }
      }
    }
  }
}

/** Consolidated map-output writer: bins the records with a spill-safe
  * ExternalSorter (map-side combine included, like SortShuffleWriter),
  * then streams every non-empty bin as an independently framed segment
  * of ONE `map_<mapId>.data` object, followed by the `.idx` segment
  * table. One sequential PUT per map task instead of corral's
  * one-object-per-bin (`emitter.go:90-120`). */
private[graft] class GraftShuffleWriter[K, V, C](
    handle: BaseShuffleHandle[K, V, C],
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
  private var sorter: ExternalSorter[K, V, _] = null
  private var stopped = false

  private final class CountingOutputStream(under: OutputStream) extends OutputStream {
    var count = 0L
    override def write(b: Int): Unit = { under.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      under.write(b, off, len); count += len
    }
    override def flush(): Unit = under.flush()
    override def close(): Unit = under.close()
  }

  override def write(records: Iterator[Product2[K, V]]): Unit = {
    val start = System.nanoTime()
    if (!records.hasNext) {
      // nothing to shuffle: no objects at all — readers skip zero-size
      // blocks from the MapStatus and never look for the files
      metrics.incWriteTime(System.nanoTime() - start)
      return
    }
    // group records by reduce bin (and map-side combine) spill-safely
    // before the single sequential upload — SortShuffleWriter's shape
    sorter = if (dep.mapSideCombine) {
      require(dep.aggregator.isDefined, "mapSideCombine without aggregator")
      new ExternalSorter[K, V, C](
        context, dep.aggregator, Some(dep.partitioner), None, dep.serializer)
    } else {
      new ExternalSorter[K, V, V](
        context, None, Some(dep.partitioner), None, dep.serializer)
    }
    sorter.insertAll(records)
    var n = 0L
    val counting = new CountingOutputStream(
      fs.create(GraftShuffleManager.dataPath(shuffleDir, mapId), true))
    try {
      sorter.partitionedIterator.foreach { case (pid, iter) =>
        if (iter.hasNext) {
          val segStart = counting.count
          // compression/encryption identical to local shuffle blocks,
          // framed per bin so each segment decodes independently; the
          // close shield lets the codec stream terminate (trailer
          // flushed through the BufferedOutputStream) while the single
          // FS object stream stays open for the next bin — the same
          // commons-io utility Spark's local-disk map-output writer
          // uses for this exact per-partition framing
          val stream = serInstance.serializeStream(serMgr.wrapStream(
            ShuffleBlockId(dep.shuffleId, mapId, pid),
            new BufferedOutputStream(
              org.apache.commons.io.output.CloseShieldOutputStream.wrap(counting),
              64 * 1024)))
          while (iter.hasNext) {
            val rec = iter.next()
            stream.writeKey[Any](rec._1)
            stream.writeValue[Any](rec._2)
            n += 1
          }
          stream.close()
          lengths(pid) = counting.count - segStart
        }
      }
    } finally counting.close()
    val idx = new DataOutputStream(new BufferedOutputStream(
      fs.create(GraftShuffleManager.indexPath(shuffleDir, mapId), true)))
    try lengths.foreach(idx.writeLong) finally idx.close()
    metrics.incRecordsWritten(n)
    metrics.incBytesWritten(counting.count + 8L * numBins)
    metrics.incWriteTime(System.nanoTime() - start)
  }

  override def stop(success: Boolean): Option[MapStatus] = {
    if (stopped) return None
    stopped = true
    if (sorter != null) { sorter.stop(); sorter = null } // frees memory + spills
    if (success) {
      Some(MapStatus(SparkEnv.get.blockManager.blockManagerId, lengths, mapId))
    } else {
      // failed/aborted attempt: drop its objects (attempt-unique names
      // mean nothing else can be reading them)
      try fs.delete(GraftShuffleManager.dataPath(shuffleDir, mapId), false)
      catch { case NonFatal(_) => }
      try fs.delete(GraftShuffleManager.indexPath(shuffleDir, mapId), false)
      catch { case NonFatal(_) => }
      None
    }
  }

  override def getPartitionLengths(): Array[Long] = lengths
}

/** Reads the requested bins of maps `[startMapIndex, endMapIndex)`
  * straight from the FS — the writing executor does not need to be
  * alive. Blocks are grouped by map: one idx read (JVM-cached) + one
  * data-object open per map, then a seek per requested segment; a map
  * whose TOTAL output is ≤ [[GraftShuffleManager.SmallDataMaxBytes]]
  * is instead fetched whole through the JVM-wide small-data cache, so
  * co-located reduce tasks decode their segments from memory without
  * touching the FS at all. Which (map, bin) blocks exist and are
  * non-empty comes from the driver's MapOutputTracker, same as local
  * shuffle. */
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
    val numBins = dep.partitioner.numPartitions
    // `metrics` is a TempShuffleReadMetrics: nothing folds it into the
    // task's final metrics unless someone calls merge (stock readers do
    // it via a CompletionIterator; without this, reads shorter than a
    // heartbeat report ZERO shuffle-read metrics to listeners/the UI)
    context.addTaskCompletionListener[Unit] { ctx =>
      ctx.taskMetrics().mergeShuffleReadMetrics()
    }
    // requested non-empty bins, grouped by map in tracker order
    val byMap = new java.util.LinkedHashMap[Long, scala.collection.mutable.ArrayBuffer[Int]]()
    SparkEnv.get.mapOutputTracker
      .getMapSizesByExecutorId(
        dep.shuffleId, startMapIndex, endMapIndex, startPartition, endPartition)
      .foreach { case (_, blockSizes) =>
        blockSizes.foreach {
          case (ShuffleBlockId(_, blockMapId, reduceId), size, _) =>
            if (size > 0) { // zero survives MapStatus compression exactly
              var bins = byMap.get(blockMapId)
              if (bins == null) {
                bins = new scala.collection.mutable.ArrayBuffer[Int]()
                byMap.put(blockMapId, bins)
              }
              bins += reduceId
            }
          case (other, _, _) =>
            // batch/merged ids come from fetch-protocol paths this
            // manager never engages; fail loud rather than mis-read
            throw new UnsupportedOperationException(
              s"unexpected shuffle block id under GraftShuffleManager: $other")
        }
      }
    // one data object open at a time; closed when its segments are
    // exhausted, with a task-completion backstop for interrupted tasks
    var current: java.io.Closeable = null
    context.addTaskCompletionListener[Unit] { _ =>
      val c = current
      current = null
      if (c != null) { try c.close() catch { case NonFatal(_) => } }
    }
    import scala.jdk.CollectionConverters._
    val recordIter: Iterator[(Any, Any)] = byMap.entrySet().iterator().asScala
      .flatMap { entry =>
        val blockMapId = entry.getKey
        val bins = entry.getValue.sorted // ascending = forward seeks only
        val lens = GraftShuffleManager.segmentLengths(
          fs, shuffleDir, blockMapId, numBins)
        val offsets = lens.scanLeft(0L)(_ + _)
        val total = offsets(numBins)
        if (total <= GraftShuffleManager.SmallDataMaxBytes) {
          // tiny map output (the iterative-fixpoint shape): fetch the
          // whole data object once per executor via the JVM-wide cache
          // and decode segments from memory — no FS open per reduce
          // task. Metrics state actual traffic: the miss that fetched
          // the object reports ONE remote read of the whole object;
          // cache-served segments count as local reads (stock Spark's
          // accounting for locally-available blocks).
          val (buf, fromCache) = GraftShuffleManager.smallDataBytes(
            fs, shuffleDir, blockMapId, total)
          if (!fromCache) {
            metrics.incRemoteBlocksFetched(1)
            metrics.incRemoteBytesRead(total)
          }
          bins.iterator.flatMap { r =>
            if (fromCache) {
              metrics.incLocalBlocksFetched(1)
              metrics.incLocalBytesRead(lens(r))
            }
            serInstance.deserializeStream(serMgr.wrapStream(
              ShuffleBlockId(dep.shuffleId, blockMapId, r),
              new java.io.ByteArrayInputStream(
                buf, offsets(r).toInt, lens(r).toInt)))
              .asKeyValueIterator
          }
        } else {
          val in = fs.open(GraftShuffleManager.dataPath(shuffleDir, blockMapId))
          current = in
          val segments: Iterator[(Any, Any)] = bins.iterator.flatMap { r =>
            in.seek(offsets(r))
            metrics.incRemoteBlocksFetched(1)
            // exact segment size from the idx — never a per-block
            // getFileStatus (a HEAD request per block on an object store)
            metrics.incRemoteBytesRead(lens(r))
            // the LimitedInputStream bounds the segment and does NOT
            // close `in` when the codec stream hits EOF and closes up
            serInstance.deserializeStream(serMgr.wrapStream(
              ShuffleBlockId(dep.shuffleId, blockMapId, r),
              new BufferedInputStream(
                new LimitedInputStream(in, lens(r), false), 64 * 1024)))
              .asKeyValueIterator
          }
          segments ++ {
            if (current eq in) current = null
            in.close()
            Iterator.empty
          }
        }
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
