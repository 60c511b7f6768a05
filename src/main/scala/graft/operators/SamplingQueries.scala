package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-rebalancing fixture queries over [[graft.api.Sampling]] —
  * the deterministic mixing step of a training-data pipeline (e.g.
  * "cap English at 10%, keep half of Spanish, most of the tail").
  * Both the Spark filter and the DuckDB oracle evaluate the identical
  * integer congruence per row, so the realized sample hash-matches. */
object SamplingQueries {

  private val Fractions = Map("en" -> 0.1, "es" -> 0.5)
  private val DefaultFraction = 0.9

  private def stratifiedQ(s: SparkSession, dir: String): DataFrame =
    graft.api.Sampling.stratified(Tables.documents(s, dir),
        "lang", "doc_id", Fractions, DefaultFraction)
      .select(col("doc_id"), col("lang"), col("source"))

  private val stratifiedSql =
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE ${graft.api.Sampling.stratifiedSql("lang", "doc_id", Fractions, DefaultFraction)}""".stripMargin

  // -- ds2: per-language token-budget cap -------------------------------
  // "cap every language at TokenBudget tokens" — the deterministic
  // prefix-cap form of corpus mixing (see Sampling.tokenBudget). Both
  // engines order by the identical integer priority and accumulate the
  // identical BIGINT running total, so the keep-set hash-matches.
  private val TokenBudget = 2000L

  private def tokenBudgetQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    graft.api.Sampling.tokenBudget(docs, "lang", "doc_id", "n_tokens", TokenBudget)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
  }

  private val tokenBudgetSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(CASE WHEN trim(text) = '' THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    ${graft.api.Sampling.tokenBudgetCumSql("lang", "doc_id", "n_tokens")}
       |      AS cum_tokens
       |  FROM d)
       |SELECT doc_id, lang, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= $TokenBudget""".stripMargin

  // -- ds3: self-tuning domain mix --------------------------------------
  // Target: an equal token share per language out of a global budget.
  // keep_rate(lang) = min(1, share / lang_tokens) is computed FROM THE
  // DATA in the same plan (token totals per lang → broadcast join back),
  // then applied as the ds1 scramble congruence — no driver round-trip,
  // no RNG. Rates are BIGINT/BIGINT divisions in double: deterministic
  // IEEE, replayed exactly by the oracle.
  private val MixBudget = 10000L // total token budget across languages

  private def domainMixQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    val totals = docs.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
    val nLangs = totals.select(count(lit(1)).as("k"))
    val rates = totals.crossJoin(broadcast(nLangs))
      .select(col("lang"),
        least(lit(1.0),
          (lit(MixBudget).cast("double") / col("k").cast("double")) /
            col("lang_tokens").cast("double")).as("keep_rate"))
    import graft.functions.PolyHashConstants.P
    docs.join(broadcast(rates), "lang")
      .filter(graft.api.Sampling.scramble(col("doc_id")).cast("double") <
        col("keep_rate") * P)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("keep_rate"))
  }

  private val domainMixSql = {
    import graft.functions.PolyHashConstants.P
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(CASE WHEN trim(text) = '' THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |tot AS (SELECT lang, SUM(n_tokens) AS lang_tokens FROM d GROUP BY lang),
       |k AS (SELECT COUNT(*) AS k FROM tot),
       |rates AS (
       |  SELECT lang,
       |    least(1.0, (CAST($MixBudget AS DOUBLE) / CAST(k.k AS DOUBLE))
       |      / CAST(lang_tokens AS DOUBLE)) AS keep_rate
       |  FROM tot CROSS JOIN k)
       |SELECT d.doc_id, d.lang, d.n_tokens, r.keep_rate
       |FROM d JOIN rates r ON d.lang = r.lang
       |WHERE CAST(${graft.api.Sampling.scrambleSql("d.doc_id")} AS DOUBLE)
       |  < r.keep_rate * $P""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("ds1_stratified_sample", stratifiedQ, Some(stratifiedSql), bench = true),
    QueryDef("ds2_token_budget", tokenBudgetQ, Some(tokenBudgetSql)),
    QueryDef("ds3_domain_mix", domainMixQ, Some(domainMixSql)),
  )
}
