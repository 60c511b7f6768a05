package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale property: joins between co-bucketed tables must not shuffle.
  * At 100 TB a fact-fact join's exchange dominates the job; bucketing
  * both sides on the join key at write time removes it entirely. This
  * spec proves the engine's layout produces an exchange-free
  * SortMergeJoin. */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("co-bucketed join plans without a shuffle exchange") {
    val s = spark
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(s, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(s, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val j = s.table("li_bucketed").join(s.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(j.count() > 0)
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
