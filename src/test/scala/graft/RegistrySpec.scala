package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and returns rows; contract
  * invariants of the SparkEntry maps. */
class RegistrySpec extends AnyFunSuite with SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("bench names are query keys") {
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("the bench subset is exactly the pinned representative set") {
    // One timed representative per cost shape — the selection rationale
    // lives in Bench's scaladoc ("THE BENCH SUBSET"). Pinned literally
    // so membership changes are deliberate, reviewed diffs: composite
    // comparability across rounds depends on this set's stability.
    // METRIC NOTE (r15): the recorded composite is the per-query MIN
    // over warm passes WITH adaptive refinement (spread > 1.25 earns
    // extra min-of passes until the min converges) — compare committed
    // BENCH totals at ±5%, not the raw per-pass numbers.
    val pinned = Set(
      // relational / MR representatives
      "q1_pricing_summary", "q2_wordcount", "q3_scan_filter", "q6_join",
      "q7_join_agg", "q16_window_topn", "q20_broadcast_star",
      "q21_event_window", "q28_asof_join", "q30_topk_agg", "mr2_join_avg",
      // text / quality / decontamination kernels
      "t3_quality", "t7_repetition", "q31_decontaminate",
      "q32_substring_overlap",
      // dedup family (near-dup, groups, increments, semantic)
      "dd1_exact_dedup", "dd2_ngram_jaccard", "dd3_minhash_lsh",
      "dd4_simhash", "dd5_embed_dup", "dd6_dup_groups", "dd7_incremental",
      "dd8_inc_simhash", "dd9_inc_embed", "dd10p_inc_groups_asset",
      "dd11_semantic",
      // r19 (verdict task #4): the Hamming ladder's extended band —
      // 17x probe-side piece rows through the untouched asset join is
      // a distinct cost shape from dd8's exact-piece probe
      "dd13_inc_simhash_h5",
      // r16 (verdict task #3): the jaccard guard's remedy verb gets a
      // first-class committed number
      "dd12_jaccard_groups",
      // similarity ladder
      "s1_cosine_topk", "s2_ann_lsh", "s3_ann_ivf", "s4_ann_ivf_trained",
      "s5_ann_ivf_hier", "s6_ann_pq_adc", "s7_ann_pq_asset", "s8_ann_ivfadc",
      // sketches, sampling, sessions, multimodal capstone
      "qs3_bloom_semijoin", "qs4_hll_per_key", "qs5_hist_quantile",
      "ds1_stratified_sample", "st1_sessionize", "mm8_ahash_dedup",
      "mm9_ahash_groups",
      // pipelines + export (p6p added r15: the image daily path at its
      // own cost — p4p's asset-twin pattern; p6 stays the un-benched
      // recompute leg)
      "p1_clean_corpus", "p2_clean_corpus_transitive",
      "p4p_daily_increment_asset", "p6p_daily_image_increment_asset",
      "p5_export_manifest",
      "ex2_pack_sequences", "ex4_best_of_group", "ex6_shard_roundtrip")
    assert(SparkEntry.benchQueries.toSet == pinned,
      s"bench set drifted: +${SparkEntry.benchQueries.toSet -- pinned} " +
        s"-${pinned -- SparkEntry.benchQueries.toSet}")
    assert(SparkEntry.benchQueries.size == 51)
  }

  test("approx_count_distinct tracks the exact distinct count within 5%") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
    val row = li.agg(
      count_distinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  Registry.defs.foreach { d =>
    test(s"${d.name} runs and returns rows") {
      val n = d.run(spark, sf0001).count()
      assert(n > 0, s"${d.name} returned 0 rows")
    }
  }
}
