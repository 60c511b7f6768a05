package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-quality operators for training-data pipelines (north-star
  * extension; no reference analogue — corral has no notion of document
  * quality, SURVEY.md §2.3):
  *
  *  - t7_repetition: Gopher-style repetition statistics (unique-word
  *    ratio, top-2-gram mass, duplicated-3-gram fraction) — the
  *    standard "drop boilerplate/spam" quality gates. All row-local
  *    array math: zero shuffles, scales linearly with corpus bytes.
  *  - t8_pii_redact: regex PII detection + redaction (emails, phone
  *    numbers) with a portable fingerprint of the redacted text — a
  *    per-row projection, embarrassingly parallel at any scale.
  *  - q31_decontaminate: benchmark decontamination — remove from the
  *    corpus every document sharing a word 4-gram with a held-out
  *    "benchmark" slice (the GPT-3/Llama-style n-gram overlap rule).
  *    The benchmark n-gram set is broadcast (eval suites are tiny
  *    relative to a 100 TB corpus by construction); the corpus side
  *    streams through one explode + broadcast-semi-join + anti-join —
  *    no O(n²) pair comparison anywhere.
  *
  * Every statistic is identical IEEE/BIGINT arithmetic in Spark and
  * the DuckDB oracle, so all three hash-match end to end.
  */
object QualityQueries {

  // -- t7: repetition statistics ---------------------------------------
  // Gram arrays come from the native one-pass word_ngrams kernel, not
  // the transform/element_at tower — identical output (pinned in
  // KernelSpec), but tokenizes each document once instead of once per
  // element reference.
  private def repetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HashFunctions.register(s)
    import graft.functions.HashFunctions.{wordNGrams => ngrams}
    val toks = ngrams(col("text"), 1)
    val g2 = ngrams(col("text"), 2)
    val g3 = ngrams(col("text"), 3)
    // most frequent 2-gram's occurrence count: one-pass native kernel
    // (hashmap count, running max — O(tokens) per row where the nested
    // higher-order-function form is O(distinct·tokens), which at the
    // 10³–10⁴-token docs a Gopher-style gate exists for is 10⁷–10⁸
    // string compares per row). Equality with the HOF form is pinned
    // in KernelSpec; row-local either way — no shuffle.
    val top2 = graft.functions.HashFunctions.topGramCount(col("text"), 2)
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .as("uniq_word_frac"),
      when(size(g2) === 0, lit(0.0))
        .otherwise(top2.cast("double") / size(g2).cast("double"))
        .as("top2gram_frac"),
      when(size(g3) === 0, lit(0.0))
        .otherwise((size(g3) - size(array_distinct(g3))).cast("double") /
          size(g3).cast("double"))
        .as("dup3gram_frac"))
  }

  private val repetitionSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, toks,
       |    ${wordGramsSql("toks", 2)} AS g2,
       |    ${wordGramsSql("toks", 3)} AS g3
       |  FROM t)
       |SELECT doc_id,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
       |    AS uniq_word_frac,
       |  CASE WHEN len(g2) = 0 THEN 0.0
       |       ELSE CAST(list_max(list_transform(list_distinct(g2),
       |              gg -> len(list_filter(g2, x -> x = gg)))) AS DOUBLE)
       |            / CAST(len(g2) AS DOUBLE) END AS top2gram_frac,
       |  CASE WHEN len(g3) = 0 THEN 0.0
       |       ELSE CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
       |            / CAST(len(g3) AS DOUBLE) END AS dup3gram_frac
       |FROM g""".stripMargin

  // -- t8: PII detect + redact ------------------------------------------
  // Patterns restricted to the lookahead-free regex subset shared by
  // Java regex (Spark) and RE2 (DuckDB). The corpus is synthetic word
  // soup with no organic PII, so the fixture plants deterministic
  // address/number suffixes keyed off doc_id — the SAME augmentation
  // expression runs in both engines, keeping the oracle honest while
  // giving the redactor real positives to find.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "555-[0-9]{4}"

  private def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), (col("doc_id") % 100).cast("string"),
          lit("@mail.example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" today"))).otherwise(lit("")))
    val redacted = regexp_replace(
      regexp_replace(aug, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    Tables.documents(s, dir).select(
      col("doc_id"),
      regexp_count(aug, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(aug, lit(PhoneRe)).cast("int").as("n_phones"),
      md5(redacted.cast("binary")).as("red_fp"))
  }

  private val piiRedactSql =
    s"""WITH aug AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0
       |         THEN ' contact user' || CAST(doc_id % 100 AS VARCHAR) ||
       |              '@mail.example.com now' ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0
       |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |              ' today' ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS INTEGER) AS n_phones,
       |  md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g')) AS red_fp
       |FROM aug""".stripMargin

  // -- q31: benchmark decontamination -----------------------------------
  // "Benchmark" slice = source 'src0' (stands in for an eval suite).
  // A corpus document is contaminated iff it shares ANY word 4-gram
  // with any benchmark document; the clean corpus drops those rows.
  private val BenchSource = "src0"
  private val ContamN = 4

  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HashFunctions.register(s)
    val docs = Tables.documents(s, dir)
    val grams = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(
        graft.functions.HashFunctions.wordNGrams(col("text"), ContamN))).as("g"))
    val benchGrams = grams.filter(col("source") === BenchSource)
      .select("g").distinct()
    val poisoned = grams.filter(col("source") =!= BenchSource)
      .join(broadcast(benchGrams), "g")
      .select("doc_id").distinct()
    docs.filter(col("source") =!= BenchSource)
      .join(poisoned, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  private val decontaminateSql =
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source,
       |    unnest(list_distinct(${wordGramsSql("toks", ContamN)})) AS g
       |  FROM t),
       |bench AS (SELECT DISTINCT g FROM grams WHERE source = '$BenchSource'),
       |poisoned AS (
       |  SELECT DISTINCT doc_id FROM grams
       |  WHERE source <> '$BenchSource' AND g IN (SELECT g FROM bench))
       |SELECT d.doc_id, d.lang, d.source FROM documents d
       |WHERE d.source <> '$BenchSource'
       |  AND d.doc_id NOT IN (SELECT doc_id FROM poisoned)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("t7_repetition", repetition, Some(repetitionSql), bench = true),
    QueryDef("t8_pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("q31_decontaminate", decontaminate, Some(decontaminateSql), bench = true),
  )
}
