package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone composition: the end-to-end training-corpus cleaning
  * pipeline a 100 TB data run actually executes, built ENTIRELY from
  * the already-oracled operators —
  *
  *   quality scoring (t3) → language filter (t2) → exact dedup keeper
  *   selection (dd1) → MinHash near-dup removal (dd3) → clean corpus
  *
  * Each stage is a join/semi-join/anti-join against another operator's
  * output, so Catalyst fuses the whole pipeline into one distributed
  * plan (shared scans, broadcast of the small pair/keeper sides at this
  * scale). The near-dup policy is the standard cheap one: of each
  * detected pair, the lower doc_id survives.
  *
  * The oracle composes the SAME stage SQLs as subqueries — proving the
  * operators compose identically in both engines, not just in
  * isolation.
  */
object PipelineQueries {

  private def defOf(defs: Seq[QueryDef], name: String): QueryDef =
    defs.find(_.name == name).get

  private val t3 = defOf(TextQueries.all, "t3_quality")
  private val t2 = defOf(TextQueries.all, "t2_langid")
  private val dd1 = defOf(DedupQueries.all, "dd1_exact_dedup")
  private val dd3 = defOf(DedupQueries.all, "dd3_minhash_lsh")

  private val MinQuality = 0.5

  private def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val quality = t3.run(s, dir)
    val lang = t2.run(s, dir)
    val keepers = dd1.run(s, dir).select(col("keep_id").as("doc_id"))
    val nearDupLosers = dd3.run(s, dir).select(col("doc_b").as("doc_id"))
    quality
      .filter(col("quality_score") >= MinQuality)
      .join(lang.filter(col("pred_lang") === "en"), "doc_id")
      .join(keepers, Seq("doc_id"), "leftsemi")
      .join(nearDupLosers, Seq("doc_id"), "leftanti")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
  }

  private val cleanCorpusSql =
    s"""WITH q AS (${t3.oracle.get}),
       |l AS (${t2.oracle.get}),
       |keepers AS (SELECT keep_id FROM (${dd1.oracle.get}) g),
       |losers AS (SELECT DISTINCT doc_b FROM (${dd3.oracle.get}) nd)
       |SELECT q.doc_id, q.n_tokens, q.quality_score
       |FROM q JOIN l ON q.doc_id = l.doc_id
       |WHERE q.quality_score >= $MinQuality
       |  AND l.pred_lang = 'en'
       |  AND q.doc_id IN (SELECT keep_id FROM keepers)
       |  AND q.doc_id NOT IN (SELECT doc_b FROM losers)""".stripMargin

  // -- p2: transitive near-dup removal ----------------------------------
  // p1's pair policy ("drop doc_b of each pair") under-drops when a
  // component's pairs don't all share their minimum — e.g. pairs (1,5)
  // and (3,5) form one cluster {1,3,5}, but 3 never appears as a doc_b
  // and survives p1. p2 swaps in dd6's connected components and keeps
  // exactly one doc (the min id) per near-dup cluster — the policy a
  // production dedup actually wants. Costs the iterative component
  // fixpoint (a handful of tiny-frame jobs), so p1 stays the benched
  // single-fused-plan form and p2 the semantically-strict form.
  private val dd6 = defOf(DedupQueries.all, "dd6_dup_groups")

  private def cleanCorpusTransitive(s: SparkSession, dir: String): DataFrame = {
    val quality = t3.run(s, dir)
    val lang = t2.run(s, dir)
    val keepers = dd1.run(s, dir).select(col("keep_id").as("doc_id"))
    val clusterLosers = dd6.run(s, dir)
      .filter(col("doc_id") =!= col("group_id")).select(col("doc_id"))
    quality
      .filter(col("quality_score") >= MinQuality)
      .join(lang.filter(col("pred_lang") === "en"), "doc_id")
      .join(keepers, Seq("doc_id"), "leftsemi")
      .join(clusterLosers, Seq("doc_id"), "leftanti")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
  }

  private val cleanCorpusTransitiveSql =
    s"""WITH q AS (${t3.oracle.get}),
       |l AS (${t2.oracle.get}),
       |keepers AS (SELECT keep_id FROM (${dd1.oracle.get}) g),
       |losers AS (
       |  SELECT doc_id FROM (${dd6.oracle.get}) cc WHERE doc_id <> group_id)
       |SELECT q.doc_id, q.n_tokens, q.quality_score
       |FROM q JOIN l ON q.doc_id = l.doc_id
       |WHERE q.quality_score >= $MinQuality
       |  AND l.pred_lang = 'en'
       |  AND q.doc_id IN (SELECT keep_id FROM keepers)
       |  AND q.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("p1_clean_corpus", cleanCorpus, Some(cleanCorpusSql), bench = true),
    QueryDef("p2_clean_corpus_transitive", cleanCorpusTransitive,
      Some(cleanCorpusTransitiveSql), bench = true),
  )
}
