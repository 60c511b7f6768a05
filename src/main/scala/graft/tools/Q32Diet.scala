package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q32 shuffle-volume diet measurement (round-11 verdict stretch task
  * #7): q32's only exchange is the pair aggregation itself — every
  * join is broadcast — so the question is whether the pair rows
  * crossing that exchange can be made cheaper. Three shapes measured
  * side by side at the same cap/threshold semantics (result row count
  * asserted equal):
  *
  *  - `current`: groupBy(doc_a, doc_b) on the join output (two long
  *    key columns + count).
  *  - `packed`: the pair packed into ONE long key (doc_a * B + doc_b,
  *    B = maxId+1 — exact while (maxId+1)² fits a long, asserted) —
  *    a narrower unsafe row through the exchange, decoded after.
  *  - `prefilter`: a first pass shuffles only a 4-byte pair HASH to
  *    find hashes reaching the n_shared >= 2 bar, then the real pair
  *    aggregation runs semi-joined against that (broadcast) hash set —
  *    pass-2 volume shrinks to surviving pairs (+ hash collisions) at
  *    the cost of generating candidates twice.
  *
  * Prints wall / task shuffle-write bytes per shape plus the candidate
  * funnel (pre-agg rows, distinct pairs, survivors). Run under both
  * shuffle modes via SPARK_GRAFT_SHUFFLE_DIR (Bench's env contract).
  * Usage: runMain graft.tools.Q32Diet [sfDir]
  */
object Q32Diet {
  private val MinSharedFps = 2
  private val MaxFpFreq = 256

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.withShuffleEnv(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HashFunctions.register(spark)
    println(s"[q32diet] shuffle: ${graft.Bench.shuffleMode} @ $sfDir")

    val docs = graft.Tables.documents(spark, sfDir)
    def cold(): DataFrame = {
      val fps = graft.api.Barrier(docs.select(col("doc_id"),
        explode(graft.functions.HashFunctions.winnowFingerprints(col("text"))).as("f")))
      val hot = fps.groupBy(col("f")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > MaxFpFreq).select(col("f"))
      fps.join(broadcast(hot), Seq("f"), "left_anti")
    }

    def pairs(c: DataFrame): DataFrame =
      c.alias("a").join(c.alias("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))

    // the candidate funnel, once
    val c0 = cold()
    val preAgg = pairs(c0).count()
    val distinctPairs = pairs(c0)
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val survivors = pairs(c0)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps).count()
    println(s"[q32diet] funnel: preAggRows=$preAgg distinctPairs=$distinctPairs " +
      s"survivors=$survivors (survivor fraction ${
        f"${survivors.toDouble / math.max(distinctPairs, 1)}%.3f"})")

    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val base = maxId + 1
    require(base > 0 && base <= (1L << 31),
      s"packed variant needs (maxId+1)^2 within a long, got maxId=$maxId")

    def current(): DataFrame = pairs(cold())
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps)

    def packed(): DataFrame = pairs(cold())
      .groupBy((col("a.doc_id") * base + col("b.doc_id")).as("pk"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps)
      .select((col("pk") / base).cast("long").as("doc_a"),
        pmod(col("pk"), lit(base)).as("doc_b"), col("n_shared"))

    def prefilter(): DataFrame = {
      val c = cold()
      val keyed = pairs(c).select(col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"))
      val hotHashes = keyed
        .select(hash(col("doc_a"), col("doc_b")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= MinSharedFps).select(col("h"))
      keyed.join(broadcast(hotHashes),
          hash(col("doc_a"), col("doc_b")) === col("h"), "left_semi")
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= MinSharedFps)
    }

    val shapes = Seq("current" -> (() => current()),
      "packed" -> (() => packed()), "prefilter" -> (() => prefilter()))
    println("| shape | warm sec | shuffle bytes | rows |")
    println("|---|---|---|---|")
    val rows = shapes.map { case (name, mk) =>
      mk().count() // warm codegen/plans
      val (n, snap) = graft.Metrics.track(spark)(mk().count())
      println(f"| $name | ${snap.wallClockSec}%.2f | ${snap.shuffleBytesWritten}%d | $n%d |")
      (name, n, snap.shuffleBytesWritten)
    }
    val counts = rows.map(_._2).distinct
    require(counts.size == 1, s"variant row counts differ: $rows")
    val currentBytes = rows.head._3.toDouble
    rows.tail.foreach { case (name, _, b) =>
      println(f"[q32diet] $name shuffle bytes vs current: ${b / currentBytes}%.3f")
    }
    spark.stop()
  }
}
