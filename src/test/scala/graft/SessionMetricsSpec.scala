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
