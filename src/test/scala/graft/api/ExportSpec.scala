package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the export verbs that the oracle gate
  * can't see: the two-phase prefix sum must be a PERMUTATION whose
  * result is independent of the internal bucketing knob (the whole
  * point of the decomposition), seeds must actually reorder, and
  * packing must conserve tokens. Runs on the sf0.001 fixture plus
  * ad-hoc frames with caller-named columns. */
class ExportSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read
    .parquet(s"$sf0001/documents.parquet").select(col("doc_id"))

  private lazy val toks = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("n_tokens"))

  test("globalPositions is a permutation of 0..n-1") {
    val n = docs.count()
    val pos = Export.globalPositions(docs, "doc_id", seed = 7L)
      .select(col("pos")).collect().map(_.getLong(0))
    assert(pos.length == n)
    assert(pos.toSet == (0L until n).toSet)
  }

  test("positions are invariant to the bucketing shift (the internal knob)") {
    def at(shift: Int) = Export.globalPositions(docs, "doc_id", 7L, shift)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // shift=31 ⇒ one bucket (the naive single-window shape); the
    // decomposed forms must reproduce it exactly
    val one = at(31)
    assert(at(18).sameElements(one))
    assert(at(4).sameElements(one))
  }

  test("different seeds permute differently, same seed reproduces") {
    def run(seed: Long) = Export.globalPositions(docs, "doc_id", seed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val a = run(7L)
    assert(run(7L).sameElements(a))
    assert(!run(8L).sameElements(a))
  }

  test("packSequences conserves tokens and respects sequence geometry") {
    val L = 128L
    val packed = Export.packSequences(toks, "doc_id", "n_tokens", 7L, L)
    val rows = packed.select(col("n_tokens"), col("cum_before"),
      col("seq_id"), col("seq_off")).collect()
    val total = toks.agg(sum("n_tokens")).head.getLong(0)
    // cum_before of the LAST doc + its tokens = the corpus total
    assert(rows.map(r => r.getLong(1) + r.getLong(0)).max == total)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) < L)          // offset in [0, L)
      assert(r.getLong(2) * L + r.getLong(3) == r.getLong(1)) // seq geometry
    }
    // cum_before values are exactly the prefix sums of the shuffled order
    val inOrder = Export.globalPositions(toks, "doc_id", 7L)
      .join(packed.select(col("doc_id").as("d"), col("cum_before")),
        col("doc_id") === col("d"))
      .orderBy(col("pos")).select(col("n_tokens"), col("cum_before"))
      .collect()
    inOrder.foldLeft(0L) { (acc, r) =>
      assert(r.getLong(1) == acc); acc + r.getLong(0)
    }
  }

  test("packSequences matches the naive unpartitioned-window form") {
    val L = 128L
    val naive = {
      val key = Export.shuffleKey(col("doc_id"), 7L)
      val w = Window.orderBy(key, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks.select(col("doc_id"),
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("cum_before"))
    }
    val two = Export.packSequences(toks, "doc_id", "n_tokens", 7L, L)
      .select(col("doc_id"), col("cum_before"))
    assert(two.exceptAll(naive).isEmpty && naive.exceptAll(two).isEmpty)
  }

  test("packSequencesAfter continues exactly where the corpus ends") {
    val corpus = toks.filter(col("doc_id") % 10 =!= 0)
    val inc = toks.filter(col("doc_id") % 10 === 0)
    val base = corpus.agg(coalesce(sum("n_tokens"), lit(0L)).as("base_tokens"))
    val baseTotal = base.head.getLong(0)
    val rows = Export.packSequencesAfter(inc, "doc_id", "n_tokens", base, 7L, 128L)
      .select(col("cum_before"), col("n_tokens")).collect()
    // the increment's layout starts at the corpus total and covers
    // exactly [baseTotal, baseTotal + incTokens) — no gap, no overlap
    assert(rows.map(_.getLong(0)).min == baseTotal)
    val incTotal = inc.agg(sum("n_tokens")).head.getLong(0)
    assert(rows.map(r => r.getLong(0) + r.getLong(1)).max == baseTotal + incTotal)
    // and the corpus's own packing lives strictly below the boundary
    val corpusMax = Export.packSequences(corpus, "doc_id", "n_tokens", 7L, 128L)
      .agg(max(col("cum_before") + col("n_tokens"))).head.getLong(0)
    assert(corpusMax == baseTotal)
  }

  test("roundRobinShard balances to within one row") {
    val p = Export.globalPositions(docs, "doc_id", 7L)
    val (shard, shardPos) = Export.roundRobinShard(col("pos"), 7)
    val sizes = p.select(shard.as("s"), shardPos.as("sp"))
      .groupBy("s").agg(count(lit(1)).as("n"), max("sp").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sizes.length == 7)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1)
    sizes.foreach { case (_, n, mx) => assert(mx == n - 1) } // dense per-shard positions
  }

  test("caller-named columns work; colliding output names fail loud") {
    val df = spark.range(10).select(col("id").as("k"))
    val p = Export.globalPositions(df, "k", 3L)
    assert(p.columns.toSeq == Seq("k", "pos"))
    val bad = df.withColumn("pos", lit(1L))
    val e = intercept[IllegalArgumentException](
      Export.globalPositions(bad, "k", 3L))
    assert(e.getMessage.contains("pos"))
  }

  test("seq/shard arithmetic stays exact past 2^53 (BIGINT, not double)") {
    // A 100 TB corpus can pass 2^53 total tokens; double-valued `/`
    // rounds there and silently mis-shards/mis-sequences. Pin the
    // integer-div forms on positions around and beyond 2^53.
    val big = (0L to 4L).map(i => (1L << 53) + i * 3 - 1)
    val df = spark.createDataFrame(big.map(Tuple1(_))).toDF("pos")
    val (shard, shardPos) = Export.roundRobinShard(col("pos"), 7)
    val got = df.select(col("pos"), shard.as("s"), shardPos.as("sp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (pos, s, sp) =>
      assert(s == pos % 7 && sp == pos / 7, s"mis-shard at $pos: ($s, $sp)")
    }
    // and seq_id/seq_off over a base_tokens beyond 2^53
    import spark.implicits._
    val base = Seq((1L << 53) + 11L).toDF("base_tokens")
    val inc = Seq((1L, 100L)).toDF("doc_id", "n_tokens")
    val row = Export.packSequencesAfter(inc, "doc_id", "n_tokens", base, 1L, 128L)
      .select("cum_before", "seq_id", "seq_off").head
    val cum = row.getLong(0)
    assert(cum == (1L << 53) + 11L)
    assert(row.getLong(1) == cum / 128L && row.getLong(2) == cum % 128L)
  }

  test("packSequences fails loud on negative token counts") {
    val df = spark.createDataFrame(Seq((1L, 5L), (2L, -3L)))
      .toDF("id", "nt")
    val e = intercept[Exception](
      Export.packSequences(df, "id", "nt", 1L, 64L).collect())
    assert(e.getMessage.contains("negative") || Option(e.getCause)
      .exists(_.getMessage.contains("negative")))
  }
}
