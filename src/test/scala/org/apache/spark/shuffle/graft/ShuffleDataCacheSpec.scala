package org.apache.spark.shuffle.graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit-pins [[GraftShuffleManager.smallDataBytes]]'s JVM-wide
  * small-data-object cache (the tiny-stage read path the iterative
  * fixpoints hit): hits skip the FS entirely, the byte counter exactly
  * tracks contents across same-key miss races and stale-entry
  * replacement, and the byte-based cap actually evicts. Lives in this
  * package for the `private[graft]` seam; needs no SparkContext, so it
  * runs in the default (unforked) test group. */
class ShuffleDataCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var fs: FileSystem = _
  private var dir: Path = _

  override def beforeAll(): Unit = {
    fs = FileSystem.getLocal(new Configuration())
    dir = new Path(
      java.nio.file.Files.createTempDirectory("graft-datacache").toUri.toString)
  }

  override def afterAll(): Unit = fs.delete(dir, true)

  private def writeData(mapId: Long, bytes: Array[Byte]): Unit = {
    val out = fs.create(GraftShuffleManager.dataPath(dir, mapId), true)
    try out.write(bytes) finally out.close()
  }

  test("second read is served from cache, not the FS") {
    val bytes = Array.tabulate(100)(_.toByte)
    writeData(1L, bytes)
    val (first, hit1) = GraftShuffleManager.smallDataBytes(fs, dir, 1L, 100L)
    assert(first.toSeq == bytes.toSeq && !hit1)
    // delete the object: a cache hit is the only way this can succeed
    fs.delete(GraftShuffleManager.dataPath(dir, 1L), false)
    val (second, hit2) = GraftShuffleManager.smallDataBytes(fs, dir, 1L, 100L)
    assert(second.toSeq == bytes.toSeq && hit2)
  }

  test("byte counter tracks contents: concurrent same-key misses count once") {
    writeData(7L, Array.fill(64)(1.toByte))
    val before = GraftShuffleManager.dataCacheSizeBytes
    // N threads all miss the same uncached key concurrently; exactly
    // one insert must be accounted (same discipline the idx cache's
    // counter is pinned to in ShuffleIdxCacheSpec)
    val threads = (1 to 8).map(_ => new Thread(() =>
      GraftShuffleManager.smallDataBytes(fs, dir, 7L, 64L)))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(GraftShuffleManager.dataCacheSizeBytes == before + 64L)
    // a stale wrong-length entry (same key, new total) is re-accounted,
    // not double-counted
    writeData(7L, Array.fill(96)(2.toByte))
    assert(GraftShuffleManager.smallDataBytes(fs, dir, 7L, 96L)._1.length == 96)
    assert(GraftShuffleManager.dataCacheSizeBytes == before + 96L)
  }

  test("purgeShuffle drops only the named dir's entries, counters exact") {
    val otherDir = new Path(
      java.nio.file.Files.createTempDirectory("graft-datacache2").toUri.toString)
    try {
      // flush any earlier tests' entries under `dir` so the byte delta
      // below is exactly this test's one entry
      GraftShuffleManager.purgeShuffle(dir.toString)
      writeData(11L, Array.fill(40)(4.toByte))
      val out = fs.create(GraftShuffleManager.dataPath(otherDir, 11L), true)
      try out.write(Array.fill(48)(5.toByte)) finally out.close()
      GraftShuffleManager.smallDataBytes(fs, dir, 11L, 40L)
      GraftShuffleManager.smallDataBytes(fs, otherDir, 11L, 48L)
      val before = GraftShuffleManager.dataCacheSizeBytes
      GraftShuffleManager.purgeShuffle(dir.toString)
      // this dir's entry gone (and its bytes), the other dir's intact
      assert(GraftShuffleManager.dataCacheSizeBytes == before - 40L)
      fs.delete(GraftShuffleManager.dataPath(dir, 11L), false)
      intercept[java.io.FileNotFoundException] {
        GraftShuffleManager.smallDataBytes(fs, dir, 11L, 40L)
      }
      assert(GraftShuffleManager.smallDataBytes(fs, otherDir, 11L, 48L)
        ._1.forall(_ == 5.toByte))
    } finally fs.delete(otherDir, true)
  }

  test("byte cap evicts: a cached entry is gone after 128 MB of inserts") {
    val bytes = Array.fill(32)(3.toByte)
    writeData(3L, bytes)
    assert(GraftShuffleManager.smallDataBytes(fs, dir, 3L, 32L)._1.toSeq ==
      bytes.toSeq)
    fs.delete(GraftShuffleManager.dataPath(dir, 3L), false)
    // insert > 128 MB of entries (4 MB each — the SmallDataMaxBytes
    // ceiling the reader enforces) to trip the clear-on-cap eviction
    val big = Array.fill(GraftShuffleManager.SmallDataMaxBytes.toInt)(0.toByte)
    (0 until 33).foreach { i =>
      val id = 100L + i
      writeData(id, big)
      GraftShuffleManager.smallDataBytes(fs, dir, id, big.length.toLong)
      fs.delete(GraftShuffleManager.dataPath(dir, id), false)
    }
    // the map-3 entry was evicted and its object is gone: must fail
    intercept[java.io.FileNotFoundException] {
      GraftShuffleManager.smallDataBytes(fs, dir, 3L, 32L)
    }
  }
}
