package graft.shuffle

import java.nio.file.Files

import org.apache.spark.shuffle.graft.GraftShuffleManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting OVER the object-store shuffle: the manager
  * reports real per-partition MapStatus sizes
  * (GraftShuffleManager.scala — `supportsReliableStorage` + uncompressed
  * index sizes), which is what lets AQE detect a skewed reduce
  * partition and split it into sub-range reads. A skew split is the one
  * consumer that exercises the `(startMapIndex, endMapIndex)` sub-range
  * path of the reader — every other plan reads full map ranges — so
  * this suite both proves the skew handling the 100 TB story leans on
  * (hot keys → AQE splits, no manual salting needed for joins) and
  * pins the sub-range reader's correctness under a real plan.
  *
  * Runs in the graft-shuffle forked JVM (build.sbt testGrouping): the
  * shuffle manager is a static conf on the SparkContext. */
class GraftShuffleSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    base = Files.createTempDirectory("graft-shuffle-skew")
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-shuffle-skew-spec")
      .config("spark.shuffle.manager", classOf[GraftShuffleManager].getName)
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.GraftShuffleDataIO")
      .config(GraftShuffleManager.DirKey, s"graftfs://$base/shuffle")
      .config("spark.hadoop.fs.graftfs.impl", classOf[graft.mr.GraftObjectFs].getName)
      .config("spark.hadoop.fs.graftfs.impl.disable.cache", "true")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.cleaner.referenceTracking", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // force the sort-merge path: a broadcast join never shuffles the
      // big side, so there would be nothing to skew-split
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // make the planted hot key register as skew at test scale: a
      // partition is skewed when > factor × median AND > threshold;
      // the advisory size is the split target
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** AQE final-plan flatten: `TreeNode.collect` does NOT descend into a
    * materialized `QueryStageExec` (its subtree is the `plan` field,
    * `children` is empty), so skew/partial-reducer nodes look absent to
    * a naive collect while the pretty-printer clearly shows them. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case r: ReusedExchangeExec => flatten(r.child)
    case other => other.children.flatMap(flatten)
  })

  test("a planted hot key fires the AQE skew split and sub-range reads stay correct") {
    // left: 60k rows, a third of them on ONE hot key (0), the rest
    // spread over 996 cold keys; a fat payload makes the hot reduce
    // partition's bytes dominate. 8 map tasks so a sub-range read is a
    // strict subset of the map outputs.
    val pad = "x" * 96
    val left = spark.range(60000).select(
      when(col("id") % 3 === 0, 0L).otherwise(col("id") % 996 + 1).as("k"),
      concat(lit("l"), col("id"), lit(pad)).as("lv"))
      .repartition(8)
    val right = spark.range(997).select(
      col("id").as("k"), concat(lit("r"), col("id")).as("rv"))
      .repartition(5)

    var lastPlan: SparkPlan = null
    def checksum(): (Long, Long) = {
      val row = left.join(right, "k")
        // pmod keeps the ANSI-mode sum far from Long overflow while
        // staying multiset-sensitive (order-independent row checksum)
        .agg(count(lit(1)).as("n"),
          sum(pmod(xxhash64(col("k"), col("lv"), col("rv")), lit(1000000007L))).as("h"))
      val r = row.collect()(0)
      // inspect the final adaptive plan of THIS executed query
      lastPlan = row.queryExecution.executedPlan
      (r.getLong(0), r.getLong(1))
    }

    val (n, h) = checksum()
    // every left row's key is in [0, 996] and right holds each exactly once
    assert(n == 60000L)

    val nodes = flatten(lastPlan)
    // (a) the skew split actually fired: the SMJ is marked as a skew
    // join and an AQE shuffle read carries PartialReducerPartitionSpec
    // entries whose map sub-ranges are strict subsets of the 8 maps
    val smjSkew = nodes.collect { case j: SortMergeJoinExec if j.isSkewJoin => j }
    assert(smjSkew.nonEmpty,
      s"no skew-marked SortMergeJoin in the final plan:\n$lastPlan")
    val partials = nodes.collect { case r: AQEShuffleReadExec =>
      r.partitionSpecs.collect { case p: PartialReducerPartitionSpec => p }
    }.flatten
    assert(partials.nonEmpty,
      s"no PartialReducerPartitionSpec in the final plan:\n$lastPlan")
    assert(partials.exists(p => p.endMapIndex - p.startMapIndex < 8),
      s"no strict map sub-range among: $partials")
    // the hot reduce partition was split into >1 sub-ranges
    val splitCounts = partials.groupBy(_.reducerIndex).map(_._2.size)
    assert(splitCounts.exists(_ > 1), s"hot partition not split: $partials")

    // (b) result equality: the same join with skew splitting disabled
    // (full-range reads only) must produce the identical multiset
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      val (n2, h2) = checksum()
      assert(n2 == n && h2 == h,
        s"skew-split result differs: ($n, $h) vs ($n2, $h2)")
      val partials2 = flatten(lastPlan).collect { case r: AQEShuffleReadExec =>
        r.partitionSpecs.collect { case p: PartialReducerPartitionSpec => p }
      }.flatten
      assert(partials2.isEmpty, "control run unexpectedly skew-split too")
    } finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }
}
