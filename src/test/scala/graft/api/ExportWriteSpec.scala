package graft.api

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Export.writeShards]] end-to-end: the export tail must produce
  * REAL files whose content round-trips (r12 verdict task #3 — the
  * reference's jobs write `output-part-<B>`,
  * `/root/reference/internal/pkg/corral/job.go:113`; a declarative
  * manifest alone is not an export). Writes the sf0.01 documents
  * (the driver's gate scale) on the local-FS leg and the
  * `graftfs://` object-store leg, reads the files back, and asserts:
  *
  *  - per-shard (n_docs, n_tokens) equals the INDEPENDENT ex3-shaped
  *    manifest computed straight from the table;
  *  - the global doc_id multiset equals the keep-set (nothing
  *    dropped, duplicated, or invented by the writer);
  *  - shard_pos is dense 0..n_s−1 within every shard (the reader's
  *    contract: shard-sequential reads stream the shuffled order);
  *  - the per-shard content signature (scramble over doc_id +
  *    shard_pos) of the FILES equals the in-plan recomputation.
  */
class ExportWriteSpec extends AnyFunSuite with SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"
  private val Seed = 42L
  private val NShards = 16

  private def docs: DataFrame =
    graft.Tables.documents(spark, sf001).select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("n_tokens"))

  /** shard → (n_docs, n_tokens, content_sig) from any (doc_id,
    * n_tokens, shard, shard_pos) frame. */
  private def manifestOf(df: DataFrame): Map[Long, (Long, Long, Long)] =
    df.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"),
        sum(Sampling.scramble(col("doc_id") + col("shard_pos"))).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** The independent expectation: positions via the API, but NEVER
    * written — computed straight off the table. */
  private lazy val expected: Map[Long, (Long, Long, Long)] = {
    val p = Export.globalPositions(docs, "doc_id", Seed)
    val (shard, shardPos) = Export.roundRobinShard(col("pos"), NShards)
    manifestOf(p.withColumn("shard", shard).withColumn("shard_pos", shardPos))
  }

  private def roundTrip(out: String): Unit = {
    Export.writeShards(docs, "doc_id", Seed, NShards, out)
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("n_tokens"),
        col("shard").cast("long").as("shard"), col("shard_pos"))
    // per-shard counts, token mass, content signature == expectation
    val got = manifestOf(back)
    assert(got.keySet == (0L until NShards.toLong).toSet)
    assert(got == expected)
    // global multiset: nothing dropped/duplicated/invented
    val n = docs.count()
    assert(back.count() == n)
    assert(back.select("doc_id").distinct().count() == n)
    assert(back.join(docs.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
    // dense per-shard positions 0..n_s-1
    val dense = back.groupBy("shard")
      .agg(min("shard_pos").as("mn"), max("shard_pos").as("mx"),
        count(lit(1)).as("cnt"))
      .collect()
    dense.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(3) - 1,
        s"shard ${r.getLong(0)} positions not dense: $r")
    }
  }

  test("writeShards round-trips on the local filesystem (sf0.01)") {
    val out = Files.createTempDirectory("export-shards").toString
    roundTrip(out)
    // partition layout: one shard=<s> dir per shard
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).sorted
    assert(dirs.length == NShards)
  }

  /** Run `body` with the given hadoopConfiguration keys set, restoring
    * their previous values (or clearing them) afterwards — the shared
    * SparkContext outlives this suite, and a leftover fs.s3g endpoint
    * pointing at a closed FakeS3 (or a stale fs impl) would bleed into
    * later suites' s3g/graftfs tests in the same JVM. */
  private def withHadoopConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    val saved = kvs.map { case (k, _) => k -> Option(hc.get(k)) }
    try { kvs.foreach { case (k, v) => hc.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => hc.set(k, v)
      case (k, None) => hc.unset(k)
    }
  }

  test("writeShards round-trips through the graftfs:// object store (sf0.01)") {
    val tmp = Files.createTempDirectory("export-shards-fs")
    withHadoopConf(
      "fs.graftfs.impl" -> classOf[graft.mr.GraftObjectFs].getName,
      "fs.graftfs.impl.disable.cache" -> "true") {
      roundTrip(s"graftfs://${tmp.toString}/shards")
    }
  }

  test("writeShards round-trips over the s3g:// S3 wire (FakeS3)") {
    val fake = new graft.s3.FakeS3()
    try {
      withHadoopConf(
        "fs.s3g.impl" -> classOf[graft.s3.S3SigV4Fs].getName,
        "fs.s3g.impl.disable.cache" -> "true",
        "fs.s3g.endpoint" -> fake.endpoint,
        "fs.s3g.region" -> "us-east-1",
        "fs.s3g.access.key" -> "AKIDTEST",
        "fs.s3g.secret.key" -> "secret",
        "fs.s3g.part.size" -> "65536") {
        roundTrip("s3g://export-bucket/shards")
      }
    } finally fake.close()
  }

  test("writeShards refuses colliding shard/shard_pos input columns") {
    val bad = docs.withColumn("shard", lit(1L))
    val e = intercept[IllegalArgumentException] {
      Export.writeShards(bad, "doc_id", Seed, NShards,
        Files.createTempDirectory("export-bad").toString)
    }
    assert(e.getMessage.contains("shard"))
  }
}
