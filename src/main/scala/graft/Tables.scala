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

  /** Normalize `events.ts` to session-zoned TimestampType whatever the
    * fixture generation wrote it as. The driver's generator has shipped
    * two formats across rounds: parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader only accepts as raw longs
    * ([[ensureNanosAsLong]]), converted here with exact integer
    * division (values ~1.7e18 exceed double precision, so no float
    * math) — and plain TIMESTAMP(MICROS, isAdjustedToUTC=false), which
    * reads as TIMESTAMP_NTZ and casts value-preserving under the
    * engine-wide UTC session timezone. Every events reader (batch +
    * streaming) funnels through this one dispatch so a future format
    * drift has exactly one place to land. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unhandled type $other — the fixture format drifted " +
          "again; teach Tables.normalizeEventTs the new type (fail-loud " +
          "here beats four obscure analysis errors downstream)")
    }
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
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
