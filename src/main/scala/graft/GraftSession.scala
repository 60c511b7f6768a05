package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap with corral's tuning surface (reference F21, the
  * config cascade `/root/reference/driver.go:44-128`,
  * `/root/reference/config.go:7-45`): explicit options > `GRAFT_*` env >
  * `graftrc` file > defaults (viper's corralrc, config.go:8-17, as a
  * java-properties file searched in `.` then `$HOME/.graft/`). Each
  * knob maps to the Spark conf that plays the same role:
  *
  * | corral setting      | here                | Spark conf |
  * |---------------------|---------------------|------------|
  * | splitSize (100 MB)  | splitSize           | spark.sql.files.maxPartitionBytes |
  * | mapBinSize (512 MB) | mapBinSize (clamp)  | (clamps splitSize, driver.go:80-86) |
  * | reduceBinSize → bin count heuristic (job.go:221-224) | reduceBins | spark.sql.shuffle.partitions; AQE coalescing refines from real stats |
  * | maxConcurrency (500)| maxConcurrency      | local[N] / executor sizing |
  * | cleanup             | (automatic)         | shuffle files managed by ContextCleaner |
  * | workingLocation     | workingLocation     | default staging dir for MultiStageDriver.runMaterialized |
  */
object GraftSession {

  final case class Conf(
      splitSize: Long = 100L << 20,
      mapBinSize: Long = 512L << 20,
      reduceBins: Option[Int] = None,
      maxConcurrency: Int = Runtime.getRuntime.availableProcessors(),
      workingLocation: Option[String] = None)

  /** Env layer of the cascade (`CORRAL_*` analog, config.go:36-44). */
  def fromEnv(env: Map[String, String] = sys.env): Conf = {
    val d = Conf()
    Conf(
      splitSize = env.get("GRAFT_SPLIT_SIZE").map(_.toLong).getOrElse(d.splitSize),
      mapBinSize = env.get("GRAFT_MAP_BIN_SIZE").map(_.toLong).getOrElse(d.mapBinSize),
      reduceBins = env.get("GRAFT_REDUCE_BINS").map(_.toInt),
      maxConcurrency = env.get("GRAFT_MAX_CONCURRENCY").map(_.toInt)
        .getOrElse(d.maxConcurrency),
      workingLocation = env.get("GRAFT_WORKING_LOCATION"))
  }

  def builder(conf: Conf = fromEnv(), local: Boolean = true): SparkSession.Builder = {
    // corral clamps splitSize to mapBinSize (driver.go:80-86)
    val split = math.min(conf.splitSize, conf.mapBinSize)
    val b = SparkSession.builder()
      // engine sessions carry the native function library (SQL-visible)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.files.maxPartitionBytes", split)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        conf.reduceBins.getOrElse(conf.maxConcurrency))
      .config("spark.ui.enabled", "false")
    if (local) b.master(s"local[${conf.maxConcurrency}]") else b
  }
}
