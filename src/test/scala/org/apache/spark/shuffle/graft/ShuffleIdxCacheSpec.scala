package org.apache.spark.shuffle.graft

import java.io.DataOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit-pins [[GraftShuffleManager.segmentLengths]]'s JVM-wide idx
  * cache: hits skip the FS entirely, the byte-based cap actually
  * evicts, and a stale entry with the wrong bin count is re-read.
  * Lives in this package for the `private[graft]` seam; needs no
  * SparkContext, so it runs in the default (unforked) test group. */
class ShuffleIdxCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var fs: FileSystem = _
  private var dir: Path = _

  override def beforeAll(): Unit = {
    fs = FileSystem.getLocal(new Configuration())
    dir = new Path(
      java.nio.file.Files.createTempDirectory("graft-idxcache").toUri.toString)
  }

  override def afterAll(): Unit = fs.delete(dir, true)

  private def writeIdx(mapId: Long, lens: Array[Long]): Unit = {
    val out = new DataOutputStream(
      fs.create(GraftShuffleManager.indexPath(dir, mapId), true))
    try lens.foreach(out.writeLong) finally out.close()
  }

  test("second read is served from cache, not the FS") {
    writeIdx(1L, Array(10L, 0L, 7L))
    val first = GraftShuffleManager.segmentLengths(fs, dir, 1L, 3)
    assert(first.toSeq == Seq(10L, 0L, 7L))
    // delete the object: a cache hit is the only way this can succeed
    fs.delete(GraftShuffleManager.indexPath(dir, 1L), false)
    val second = GraftShuffleManager.segmentLengths(fs, dir, 1L, 3)
    assert(second.toSeq == Seq(10L, 0L, 7L))
  }

  test("numBins mismatch bypasses a stale cached entry") {
    writeIdx(2L, Array(1L, 2L))
    assert(GraftShuffleManager.segmentLengths(fs, dir, 2L, 2).length == 2)
    // same key, different bin count (a different shuffle dir would be
    // the real-world shape; the guard is on entry length): must re-read
    writeIdx(2L, Array(1L, 2L, 3L, 4L))
    assert(GraftShuffleManager.segmentLengths(fs, dir, 2L, 4).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("byte counter tracks contents: concurrent same-key misses count once") {
    writeIdx(7L, Array(3L, 4L, 5L))
    val before = GraftShuffleManager.idxCacheSizeBytes
    // N threads all miss the same uncached key concurrently; exactly
    // one insert must be accounted (the old lock-free path double-
    // counted every race, drifting the cap's counter from the contents)
    val threads = (1 to 8).map(_ => new Thread(() =>
      GraftShuffleManager.segmentLengths(fs, dir, 7L, 3)))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(GraftShuffleManager.idxCacheSizeBytes == before + 8L * 3)
    // a stale-entry replacement re-accounts, not double-counts
    writeIdx(7L, Array(1L, 2L, 3L, 4L, 5L))
    GraftShuffleManager.segmentLengths(fs, dir, 7L, 5)
    assert(GraftShuffleManager.idxCacheSizeBytes == before + 8L * 5)
  }

  test("byte cap evicts: a cached entry is gone after 64 MB of inserts") {
    writeIdx(3L, Array(5L, 6L))
    assert(GraftShuffleManager.segmentLengths(fs, dir, 3L, 2).toSeq == Seq(5L, 6L))
    fs.delete(GraftShuffleManager.indexPath(dir, 3L), false)
    // insert > 64 MB of idx entries (8 MB each at 2^20 bins) to trip
    // the clear-on-cap eviction
    val wide = Array.fill(1 << 20)(1L)
    (0 until 9).foreach { i =>
      val id = 100L + i
      writeIdx(id, wide)
      GraftShuffleManager.segmentLengths(fs, dir, id, 1 << 20)
      fs.delete(GraftShuffleManager.indexPath(dir, id), false)
    }
    // the map-3 entry was evicted and its object is gone: must fail
    intercept[java.io.FileNotFoundException] {
      GraftShuffleManager.segmentLengths(fs, dir, 3L, 2)
    }
  }
}
