package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Reference analogue: corral's input layer lists + splits text files
  * (`/root/reference/internal/pkg/corfs/filesys.go:21-35`,
  * `/root/reference/split.go:15-47`). Spark's FileSourceScanExec does the
  * same glob + byte-range splitting natively (`spark.sql.files.maxPartitionBytes`),
  * so the "source" layer here is just schema-aware parquet reads — filters
  * and column pruning push down to the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Reading TIMESTAMP(NANOS) parquet (the events fixture) requires
    * this session conf; every events reader (batch + streaming) funnels
    * through here so the requirement is explicit and idempotent rather
    * than a scattered side effect. */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw nanos and convert to microsecond
    * TimestampType with exact integer division (values ~1.7e18 exceed
    * double precision, so no float math here). */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = apply(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame     = eventsRaw(spark, sfDir)
  def documents(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
