package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val s = spark
    val li = Tables.lineitem(s, sf0001)
    val o = Tables.orders(s, sf0001)
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(li, o,
        col("l_orderkey"), col("o_orderkey"),
        col("l_linenumber"), salts = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salt spreads a hot key across multiple shuffle partitions") {
    val s = spark
    import org.apache.spark.sql.Row
    // a degenerate dataset: every row has the same join key
    val hot = s.createDataFrame(
      s.sparkContext.parallelize((1 to 1000).map(i => Row(1L, i.toLong))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("row_id", org.apache.spark.sql.types.LongType))))
    val salts = hot
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected the hot key spread over >4 salts, got $salts")
  }
}
