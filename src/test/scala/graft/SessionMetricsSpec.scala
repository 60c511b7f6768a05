package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionMetricsSpec extends AnyFunSuite with SparkSpec {

  test("config cascade: env overrides defaults, explicit clamp applies (F21)") {
    val conf = GraftSession.fromEnv(Map(
      "GRAFT_SPLIT_SIZE" -> (700L << 20).toString,
      "GRAFT_MAP_BIN_SIZE" -> (512L << 20).toString,
      "GRAFT_REDUCE_BINS" -> "7"))
    assert(conf.splitSize == (700L << 20))
    assert(conf.reduceBins.contains(7))
    // clamp: splitSize ≤ mapBinSize (driver.go:80-86)
    assert(math.min(conf.splitSize, conf.mapBinSize) == (512L << 20))
  }

  test("config cascade: options > env > graftrc file > defaults (F21)") {
    val dir = java.nio.file.Files.createTempDirectory("graftrc-test")
    val rcPath = dir.resolve("graftrc")
    java.nio.file.Files.write(rcPath,
      java.util.Arrays.asList(
        "splitSize=111",
        "maxConcurrency=9",
        "workingLocation=/tmp/from-file"))
    try {
      val rc = GraftSession.loadRc(Seq(rcPath))
      // file > defaults
      val fileOnly = GraftSession.fromEnv(Map.empty, rc)
      assert(fileOnly.splitSize == 111L)
      assert(fileOnly.maxConcurrency == 9)
      assert(fileOnly.workingLocation.contains("/tmp/from-file"))
      // env > file (per-key: splitSize overridden, workingLocation still file's)
      val envOver = GraftSession.fromEnv(Map("GRAFT_SPLIT_SIZE" -> "222"), rc)
      assert(envOver.splitSize == 222L)
      assert(envOver.workingLocation.contains("/tmp/from-file"))
      // options > env (explicit copy on top of the resolved cascade)
      assert(envOver.copy(splitSize = 333L).splitSize == 333L)
      // shuffleLocation rides the same cascade (GraftShuffleSpec covers
      // the manager the builder wires it to)
      val shuf = GraftSession.fromEnv(
        Map("GRAFT_SHUFFLE_LOCATION" -> "graftfs:///tmp/bins"), rc)
      assert(shuf.shuffleLocation.contains("graftfs:///tmp/bins"))
      assert(fileOnly.shuffleLocation.isEmpty)
      // missing file → defaults untouched
      val missing = GraftSession.loadRc(Seq(dir.resolve("nope")))
      assert(GraftSession.fromEnv(Map.empty, missing) == GraftSession.Conf())
    } finally {
      java.nio.file.Files.deleteIfExists(rcPath)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("defaults match the reference's (config.go:7-45)") {
    val d = GraftSession.Conf()
    assert(d.splitSize == 100L * 1024 * 1024)
    assert(d.mapBinSize == 512L * 1024 * 1024)
  }

  test("metrics track bytes read and wall clock (F22)") {
    val s = spark
    val (n, snap) = Metrics.track(s) {
      Tables.lineitem(s, sf0001).agg(count(lit(1))).head().getLong(0)
    }
    assert(n > 0)
    assert(snap.bytesRead > 0, s"expected parquet bytes read, got $snap")
    assert(snap.wallClockSec > 0)
    // the r20 per-query contention kernel: the tracked body's own
    // tasks must report run AND cpu time, and the factor must be
    // finite and >= ~1 (a task thread cannot get more than a core);
    // an upper bound would encode box state, so none is asserted
    assert(snap.executorRunTimeMs > 0, s"no task run time in $snap")
    assert(snap.executorCpuTimeNs > 0, s"no task cpu time in $snap")
    assert(snap.delayFactor > 0.5 && !snap.delayFactor.isInfinite,
      s"delay factor ${snap.delayFactor}")
    // unmeasured sentinel: no cpu time -> -1, never a division blowup
    assert(Metrics.Snapshot(0, 0, 0, 1.0).delayFactor == -1.0)
  }

  test("metrics see shuffle writes for a grouped query") {
    val s = spark
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      val (_, snap) = Metrics.track(s) {
        Tables.lineitem(s, sf0001)
          .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")))
          .count()
      }
      assert(snap.shuffleBytesWritten > 0, s"expected shuffle bytes, got $snap")
    } finally s.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
