package graft.s3

import org.apache.spark.shuffle.graft.GraftShuffleManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The full S3 wire path under Spark: table IO (parquet write + read)
  * AND the object-store shuffle both over [[S3SigV4Fs]] against the
  * stateful fake — every byte of shuffle and storage in this suite
  * moves through SigV4-signed S3 REST calls (PutObject / multipart /
  * ranged GetObject / ListObjectsV2). This is the reference's S3
  * deployment shape (`corfs/s3.go` storage + `emitter.go` shuffle)
  * carried by ONE scheme-parameterized FileSystem — `graftfs://`
  * proved the seam, this proves the protocol.
  *
  * Runs in the graft-shuffle forked JVM (build.sbt testGrouping): the
  * shuffle manager is a static conf on the SparkContext. */
class GraftShuffleS3Spec extends AnyFunSuite with BeforeAndAfterAll {

  private var fake: FakeS3 = _
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    fake = new FakeS3()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-shuffle-s3-spec")
      .config("spark.shuffle.manager", classOf[GraftShuffleManager].getName)
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.GraftShuffleDataIO")
      .config(GraftShuffleManager.DirKey, "s3g://test-bucket/shuffle")
      .config("spark.hadoop.fs.s3g.impl", classOf[S3SigV4Fs].getName)
      .config("spark.hadoop.fs.s3g.impl.disable.cache", "true")
      .config("spark.hadoop.fs.s3g.endpoint", fake.endpoint)
      .config("spark.hadoop.fs.s3g.region", "us-east-1")
      .config("spark.hadoop.fs.s3g.access.key", "AKIDTEST")
      .config("spark.hadoop.fs.s3g.secret.key", "secret")
      // small parts so a shuffle data object exercises multipart too
      .config("spark.hadoop.fs.s3g.part.size", "65536")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.cleaner.referenceTracking", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (fake != null) fake.close()
  }

  test("a shuffle job moves every byte through SigV4-signed S3 objects") {
    // repartition (not groupBy) so RAW rows cross the exchange —
    // map-side partial aggregation would collapse the shuffle to 97
    // combined rows per map; ~32 incompressible bytes per raw row
    // push each map's data object past the 64 KB part size, so the
    // multipart path carries real shuffle bytes
    val df = spark.range(0, 100000, 1, 8)
      .select((col("id") % 97).as("k"),
        md5(concat(lit("v"), col("id"))).as("v"))
      .repartition(7, col("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum(length(col("v"))).as("bytes"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 97)
    assert(rows.values.sum == 100000L)
    // the consolidated per-map layout landed as S3 objects
    val keys = fake.objects.keySet().asScala.filter(_.startsWith("test-bucket/shuffle/"))
    assert(keys.exists(_.matches(".*map_\\d+\\.data")), s"no data objects in $keys")
    assert(keys.exists(_.matches(".*map_\\d+\\.idx")), s"no idx objects in $keys")
    assert(fake.partPuts.get() > 0,
      "shuffle data objects should have engaged the multipart path")
  }

  test("parquet tables round-trip over s3g:// (write, list, pruned read)") {
    val src = spark.range(0, 5000)
      .select(col("id"), (col("id") % 7).as("g"),
        concat(lit("name-"), col("id")).as("name"))
    src.write.mode("overwrite").parquet("s3g://test-bucket/tables/t1")
    val back = spark.read.parquet("s3g://test-bucket/tables/t1")
    assert(back.count() == 5000)
    // projection + predicate run through ranged GETs of the footer/pages
    val agg = back.filter(col("g") === 3).agg(sum("id")).collect()(0).getLong(0)
    val expected = (0L until 5000L).filter(_ % 7 == 3).sum
    assert(agg == expected)
  }

  test("a query over an s3g:// table with an s3g:// shuffle matches local compute") {
    val docs = spark.range(0, 20000)
      .select(col("id").as("doc_id"), (col("id") % 131).as("shard"),
        md5(concat(lit("t"), col("id"))).as("text"))
    docs.write.mode("overwrite").parquet("s3g://test-bucket/tables/docs")
    val t = spark.read.parquet("s3g://test-bucket/tables/docs")
    val got = t.groupBy("shard").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("shard"))).collect()(0).getLong(0)
    val want = (0L until 20000L).map(i => i % 131).sum
    assert(got == want)
  }
}
