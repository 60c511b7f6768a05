package graft.operators

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips beyond parquet + TSV: CSV (the reference's
  * actual input format for the amplab workloads), JSON lines, and
  * gzip'd text (Hadoop TextInputFormat decompresses by extension —
  * object-store corpora arrive compressed). Values are pinned against
  * the parquet-sourced originals, not just shapes. */
class SourceSinkSpec extends AnyFunSuite with SparkSpec {

  test("CSV sink/source round-trips lineitem columns exactly") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", LongType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == src.count())
    // exact value parity: 2-decimal doubles survive csv round-trip
    val a = src.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().get(0)
    val b = back.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().get(0)
    assert(a == b)
    // filters push into the CSV scan
    val plan = back.filter(col("l_orderkey") === 42L).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"),
      s"no pushed filter in:\n$plan")
  }

  test("JSON-lines sink/source preserves types and nested values") {
    val dir = Files.createTempDirectory("graft-json").toString
    val src = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        struct(col("o_orderstatus").as("st")).as("meta"))
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == src.count())
    val a = src.select(sum(col("o_totalprice").cast("decimal(18,2)")),
      countDistinct(col("meta.st"))).head()
    val b = back.select(sum(col("o_totalprice").cast("decimal(18,2)")),
      countDistinct(col("meta.st"))).head()
    assert(a == b)
  }

  test("gzip'd text decodes transparently by extension (TextKV path)") {
    val dir = Files.createTempDirectory("graft-gz")
    val gz = dir.resolve("input.txt.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write("k1\tv1\nk2\tv2\nplain line\n".getBytes("UTF-8"))
    out.close()
    val kvs = graft.mr.TextKV.read(spark, gz.toString).collect().toSet
    assert(kvs == Set("k1" -> "v1", "k2" -> "v2", "" -> "plain line"))
  }
}
