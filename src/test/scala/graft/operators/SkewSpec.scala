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

  test("planted hot band bucket: AQE skew-split bounds the candidate join's per-task input") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // 300 identical docs → identical minhash signatures → ONE (band, bkey)
    // bucket per band holds 10×+ the median partition's rows: the
    // adversarial boilerplate case for the banded self-join. 200 unique
    // docs (disjoint vocab) form the background; repartition(8) spreads
    // the hot docs across map tasks so AQE can slice the bucket by map
    // ranges.
    val hot = 300
    val docs = ((1 to hot).map(i =>
        (i.toLong, "common boilerplate header repeated across mirrored documents alpha beta gamma delta")) ++
      (hot + 1 to hot + 200).map(i =>
        (i.toLong, s"doc $i " + (1 to 12).map(j => s"w${i * 31 + j * 7}").mkString(" "))))
      .toDF("doc_id", "text").repartition(8)
    val confs = Map(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "3KB")
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val pairs = graft.api.Dedup.jaccardPairs(docs, "doc_id", "text", 8, 4, 0.8)
      val n = pairs.collect().length
      // hot docs pair all-with-all at jac 1.0; unique docs share no
      // shingle with anything, so the planted bucket is the whole output
      assert(n == hot * (hot - 1) / 2, s"expected all-pairs of the hot bucket, got $n")
      val adaptive = pairs.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no adaptive plan — AQE off?"))
      // TreeNode.collect stops at QueryStageExec (its materialized
      // subtree is `plan`, not `children`) — flatten through stages and
      // reused exchanges by hand
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
          case other => other.children
        }
        p +: kids.flatMap(flatten)
      }
      val finalPlan = flatten(adaptive.executedPlan)
      val skewJoins = finalPlan.collect { case j: SortMergeJoinExec if j.isSkewJoin => j }
      assert(skewJoins.nonEmpty,
        s"no skew-split join in the final plan:\n${adaptive.executedPlan}")
      // the hot reducer partition was split into map-range slices, and no
      // slice (= no task's share of the bucket) carries most of it
      val partials = finalPlan.collect { case r: AQEShuffleReadExec => r }
        .flatMap(_.partitionSpecs)
        .collect { case p: PartialReducerPartitionSpec => p }
      assert(partials.nonEmpty, "skew join present but no partial-reducer splits")
      val hottest = partials.groupBy(_.reducerIndex).maxBy(_._2.map(_.dataSize).sum)._2
      assert(hottest.size >= 2, s"hot partition not split: $hottest")
      val maxSlice = hottest.map(_.dataSize).max
      val bucketTotal = hottest.map(_.dataSize).sum
      assert(maxSlice <= (bucketTotal * 6) / 10,
        s"one task still reads most of the hot bucket: $maxSlice of $bucketTotal bytes")
    } finally {
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
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
